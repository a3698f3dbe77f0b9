"""The tfds-gated glue, exercised with a mocked tensorflow_datasets.

tensorflow_datasets is not installed in this image; these tests inject a
minimal fake so the gated code paths (datasets/tfds.py DataSource,
tools/download_tfds_datasets.py) are executed instead of rotting
unimported. The fake mirrors the tfds API surface the glue touches:
builder().info.splits / as_dataset / even_splits / decode.SkipDecoding /
ReadConfig / load.
"""

import sys
import types

import numpy as np
import pytest


class _FakeNumpyDs:

  def __init__(self, rows):
    self.rows = rows

  def as_numpy_iterator(self):
    return iter(self.rows)


def _make_fake_tfds(record):
  tfds = types.ModuleType("tensorflow_datasets")

  class SkipDecoding:
    pass

  class ReadConfig:
    def __init__(self, **kw):
      record["read_config"] = kw

  class _Split:
    num_examples = 7

  class _Info:
    splits = {"train": _Split(), "test": _Split()}

  class _Builder:
    info = _Info()

    def as_dataset(self, *, split, shuffle_files, decoders, read_config):
      record["as_dataset"] = dict(split=split, shuffle_files=shuffle_files,
                                  decoders=decoders)
      return _FakeNumpyDs([
          {"image": np.bytes_(b"\xff\xd8raw"), "label": np.int64(i)}
          for i in range(7)])

  def builder(name, data_dir=None, try_gcs=False):
    record["builder"] = dict(name=name, data_dir=data_dir)
    return _Builder()

  def even_splits(split, n):
    return [f"{split}[{i}shard{n}]" for i in range(n)]

  def load(name, download):
    record.setdefault("loaded", []).append(name)

  tfds.builder = builder
  tfds.even_splits = even_splits
  tfds.load = load
  tfds.decode = types.SimpleNamespace(SkipDecoding=SkipDecoding)
  tfds.ReadConfig = ReadConfig
  return tfds


@pytest.fixture()
def fake_tfds(monkeypatch):
  record = {}
  fake = _make_fake_tfds(record)
  monkeypatch.setitem(sys.modules, "tensorflow_datasets", fake)
  # The builder cache would otherwise leak the fake across tests.
  from big_vision_tpu.datasets import tfds as tfds_mod
  tfds_mod._builder.cache_clear()
  yield record
  tfds_mod._builder.cache_clear()


def test_tfds_source_reads_examples(fake_tfds):
  from big_vision_tpu.datasets import tfds as tfds_mod
  src = tfds_mod.DataSource("cifar_fake", split="train")
  assert src.total_examples == 7
  assert src.num_examples_per_process() == 7  # single process
  rows = list(src.get_examples(ordered=True))
  assert len(rows) == 7
  assert all("_id" in r for r in rows)
  # Per-process even_splits subsplit reached as_dataset.
  assert fake_tfds["as_dataset"]["split"] == "train[0shard1]"
  assert fake_tfds["as_dataset"]["shuffle_files"] is False
  # skip_decode turned into SkipDecoding decoders for the image key.
  assert set(fake_tfds["as_dataset"]["decoders"]) == {"image"}


def test_tfds_source_shuffled_epoch_seed(fake_tfds):
  from big_vision_tpu.datasets import tfds as tfds_mod
  src = tfds_mod.DataSource("cifar_fake", split="train")
  list(src.get_examples(ordered=False, seed=3, epoch=2))
  assert fake_tfds["as_dataset"]["shuffle_files"] is True
  assert fake_tfds["read_config"]["shuffle_seed"] == 3002


def test_dataset_get_falls_through_to_tfds(fake_tfds, tmp_path, monkeypatch):
  monkeypatch.setenv("BV_DATA_DIR", str(tmp_path))  # no built datasets
  from big_vision_tpu.datasets import core
  src = core.get("cifar_fake", split="train")
  assert src.total_examples == 7
  assert fake_tfds["builder"]["name"] == "cifar_fake"


def test_download_tool_with_fake_tfds(fake_tfds):
  from big_vision_tpu.tools import download_tfds_datasets as tool
  rc = tool.main(["download_tfds_datasets.py", "cifar10", "cifar100"])
  assert rc == 0
  assert fake_tfds["loaded"] == ["cifar10", "cifar100"]


def test_download_tool_without_tfds(capsys, monkeypatch):
  monkeypatch.delitem(sys.modules, "tensorflow_datasets", raising=False)
  from big_vision_tpu.tools import download_tfds_datasets as tool
  rc = tool.main(["download_tfds_datasets.py"])
  assert rc == 1
  assert "not installed" in capsys.readouterr().err


def test_tfds_source_clear_error_without_tfds(monkeypatch):
  monkeypatch.delitem(sys.modules, "tensorflow_datasets", raising=False)
  from big_vision_tpu.datasets import tfds as tfds_mod
  tfds_mod._builder.cache_clear()
  with pytest.raises(ImportError, match="tensorflow_datasets is not"):
    tfds_mod.DataSource("imagenet2012", split="train")
