"""TFDS DataSource (gated: needs the tensorflow_datasets package).

Reads TFDS-prepared datasets without tf.data: uses the TFDS builder's
as_numpy_iterator over this process's even_split. Parity target: reference
big_vision/datasets/tfds.py (per-process splits, skip_decode on images,
stable _id from tfds_id).
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from big_vision_tpu.datasets import core


@functools.lru_cache(maxsize=None)
def _builder(name, data_dir):
  try:
    import tensorflow_datasets as tfds
  except ImportError as e:
    from big_vision_tpu.datasets import catalog
    raise ImportError(
        "tensorflow_datasets is not installed in this image. Use the "
        "'synthetic', 'jsonl', 'imagefolder' or 'arrays' data sources, or "
        "install tfds to read TFDS datasets. "
        + catalog.describe(name)) from e
  return tfds.builder(name, data_dir=data_dir, try_gcs=True)


class DataSource(core.DataSource):

  def __init__(self, name, split="train", data_dir=None, skip_decode=("image",)):
    self.builder = _builder(name, data_dir)  # Gated (clear ImportError).
    self.split = split
    self.skip_decode = skip_decode
    info_split = self.builder.info.splits[split]
    self.total_examples = info_split.num_examples
    self._process_splits = None

  def num_examples_per_process(self):
    start, stop = core.process_split(self.total_examples)
    return stop - start

  def get_examples(self, *, ordered, seed=0, epoch=0):
    import tensorflow_datasets as tfds
    pi, pc = jax.process_index(), jax.process_count()
    subsplit = tfds.even_splits(self.split, pc)[pi]
    decoders = {k: tfds.decode.SkipDecoding() for k in self.skip_decode}
    ds = self.builder.as_dataset(
        split=subsplit, shuffle_files=not ordered,
        decoders=decoders,
        read_config=tfds.ReadConfig(
            shuffle_seed=(seed * 1000 + epoch) if not ordered else None,
            skip_prefetch=True, try_autocache=False))
    for i, ex in enumerate(ds.as_numpy_iterator()):
      ex = dict(ex)
      ex.setdefault("_id", np.int64(i))
      yield ex
