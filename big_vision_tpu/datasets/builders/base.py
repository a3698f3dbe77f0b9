"""Builder registry + the build() driver writing the built-dataset layout.

A builder is registered as:

  @base.register("vqa")
  class Vqa(base.Builder):
    SPLITS = ("train", "validation", "test", "test-dev")
    FILE_KEYS = ("image",)
    def generate(self, split):
      yield {"image": base.File("/abs/path.jpg"), "question": ..., ...}

`File(path)` marks a value as a file to import: build() hardlinks (or
copies) it under <out>/<name>/files/ and the jsonl row stores the relative
path; `built.DataSource` reads it back as bytes. Values that are already
`bytes` are written to files/ directly (key-derived name).

Builders read RAW public downloads (urls documented per module), exactly
like the reference's GeneratorBasedBuilders (e.g. reference
big_vision/datasets/vqa/vqa.py:16-31) — but emit the TF-free layout.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import shutil

_REGISTRY = {}


@dataclasses.dataclass
class File:
  """Marks a value as a filesystem path to import into the dataset."""
  path: str


class Builder:
  """One dataset; subclass and register."""

  SPLITS: tuple = ()
  FILE_KEYS: tuple = ("image",)

  def __init__(self, raw_dir):
    self.raw_dir = raw_dir

  def generate(self, split):
    raise NotImplementedError

  # -- helpers shared by concrete builders ---------------------------------
  def path(self, *parts):
    return os.path.join(self.raw_dir, *parts)

  def json(self, *parts):
    with open(self.path(*parts)) as f:
      return json.load(f)

  def jsonl(self, *parts):
    with open(self.path(*parts)) as f:
      return [json.loads(line) for line in f if line.strip()]


def register(name):
  def wrap(cls):
    _REGISTRY[name] = cls
    cls.NAME = name
    return cls
  return wrap


def get(name):
  if name not in _REGISTRY:
    from big_vision_tpu.datasets import builders
    builders.load_all()
  return _REGISTRY[name]


def names():
  from big_vision_tpu.datasets import builders
  builders.load_all()
  return sorted(_REGISTRY)


def _import_file(value, key, files_dir, link):
  """File/bytes value -> relative path under files/."""
  if isinstance(value, File):
    src = value.path
    rel = os.path.join(
        key, hashlib.sha1(src.encode()).hexdigest()[:16]
        + os.path.splitext(src)[1].lower())
    dst = os.path.join(files_dir, rel)
    if not os.path.exists(dst):
      os.makedirs(os.path.dirname(dst), exist_ok=True)
      if link:
        try:
          os.link(src, dst)
        except OSError:
          shutil.copyfile(src, dst)
      else:
        shutil.copyfile(src, dst)
    return rel
  assert isinstance(value, bytes), type(value)
  rel = os.path.join(key, hashlib.sha1(value).hexdigest()[:20] + ".bin")
  dst = os.path.join(files_dir, rel)
  if not os.path.exists(dst):
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "wb") as f:
      f.write(value)
  return rel


def build(name, raw_dir, out_dir=None, splits=None, link=True,
          progress=None):
  """Converts raw downloads into the built-dataset layout.

  Returns the dataset directory. `link=True` hardlinks image files when
  possible (same filesystem) instead of copying.
  """
  from big_vision_tpu.datasets import built
  cls = get(name)
  b = cls(raw_dir)
  ds_dir = built.dataset_dir(name, out_dir)
  files_dir = os.path.join(ds_dir, "files")
  os.makedirs(files_dir, exist_ok=True)

  counts = {}
  file_keys = set()
  for split in (splits or b.SPLITS):
    n = 0
    with open(os.path.join(ds_dir, f"{split}.jsonl"), "w") as f:
      for ex in b.generate(split):
        row = {}
        for k, v in ex.items():
          if isinstance(v, (File, bytes)):
            row[k] = _import_file(v, k, files_dir, link)
            file_keys.add(k)
          elif (isinstance(v, list) and v
                and all(isinstance(e, (File, bytes)) for e in v)):
            row[k] = [_import_file(e, k, files_dir, link) for e in v]
            file_keys.add(k)
          else:
            row[k] = v
        f.write(json.dumps(row) + "\n")
        n += 1
        if progress and n % 10_000 == 0:
          progress(split, n)
    counts[split] = n

  info_path = os.path.join(ds_dir, "info.json")
  if os.path.isfile(info_path):  # merge with previously built splits
    with open(info_path) as f:
      old = json.load(f)
    counts = {**old.get("splits", {}), **counts}
    file_keys |= set(old.get("fopen_keys", []))
  with open(info_path, "w") as f:
    json.dump({"name": name, "splits": counts,
               "fopen_keys": sorted(file_keys)}, f, indent=1)
  return ds_dir
