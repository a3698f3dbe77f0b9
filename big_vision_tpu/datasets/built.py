"""DataSource over datasets produced by big_vision_tpu.datasets.builders.

Layout on disk (written by builders.base.build / tools/build_dataset.py):

  <data_dir>/<name>/
    info.json          {"name", "splits": {split: n}, "fopen_keys": [...]}
    <split>.jsonl      one example per line
    files/...          image (or other blob) files, referenced by relative
                       path from the jsonl rows' fopen keys

Split expressions support the tfds subset the transfer configs use
(union "+", absolute and percent slices) via datasets/splits.py — so the
reference configs' `split="train[:98%]+restval"` strings work unchanged.

Parity target: replaces the reference's tfds.load over its custom
GeneratorBasedBuilders (reference big_vision/datasets/*/; e.g. vqa/vqa.py)
with a TF-free read path.
"""

from __future__ import annotations

import functools
import json
import os

import numpy as np

from big_vision_tpu.datasets import core
from big_vision_tpu.datasets import splits as splits_lib


def default_data_dir():
  return os.environ.get("BV_DATA_DIR",
                        os.path.expanduser("~/bv_tpu_data"))


def dataset_dir(name, data_dir=None):
  return os.path.join(data_dir or default_data_dir(), *name.split(":")[0]
                      .split("/"))


def exists(name, data_dir=None):
  """True if `name` was built into `data_dir` (info.json present)."""
  return os.path.isfile(os.path.join(dataset_dir(name, data_dir),
                                     "info.json"))


def has_split(name, split, data_dir=None):
  """True if the built dataset can serve `split` (guards stale builds).

  info.json is merged per built split, so a partial build may exist
  without the requested split; callers fall through to tfds then.
  """
  if split is None:
    return True
  ds_dir = dataset_dir(name, data_dir)
  try:
    with open(os.path.join(ds_dir, "info.json")) as f:
      splits = json.load(f).get("splits", {})
  except (OSError, ValueError):
    return False
  from big_vision_tpu.datasets import splits as splits_lib
  try:
    pieces = splits_lib.parse(split)
  except ValueError:
    return False
  return all(p[0] in splits for p in pieces)


@functools.lru_cache(maxsize=64)
def _load_split(ds_dir, split):
  fname = os.path.join(ds_dir, f"{split}.jsonl")
  if not os.path.isfile(fname):
    raise FileNotFoundError(
        f"Split {split!r} not found under {ds_dir} (no {fname}). "
        f"Build it with tools/build_dataset.py.")
  with open(fname) as f:
    return tuple(json.loads(line) for line in f)


class DataSource(core.DataSource):
  """Reads a built dataset; one (name, split-expression) per instance."""

  def __init__(self, name, *, split, data_dir=None):
    self.dir = dataset_dir(name, data_dir)
    with open(os.path.join(self.dir, "info.json")) as f:
      self.info = json.load(f)
    self.fopen_keys = self.info.get("fopen_keys", [])
    rows = []
    for piece in splits_lib.parse(split):
      sp = splits_lib.materialize(piece, self.info["splits"][piece[0]])
      rows.extend(_load_split(self.dir, sp[0])[sp[1]:sp[2]])
    self.rows = rows
    self.total_examples = len(rows)
    self._start, self._stop = core.process_split(len(rows))

  def num_examples_per_process(self):
    return self._stop - self._start

  def _read(self, rel):
    with open(os.path.join(self.dir, "files", rel), "rb") as f:
      return f.read()

  def _example(self, i):
    ex = dict(self.rows[i])
    for key in self.fopen_keys:
      if key in ex and ex[key] is not None:
        v = ex[key]
        ex[key] = ([self._read(r) for r in v] if isinstance(v, list)
                   else self._read(v))
    ex.setdefault("_id", np.int64(i))
    return ex

  def get_examples(self, *, ordered, seed=0, epoch=0):
    idx = np.arange(self._start, self._stop)
    if not ordered:
      rng = np.random.default_rng((seed, epoch))
      idx = rng.permutation(idx)
    for i in idx:
      yield self._example(int(i))
