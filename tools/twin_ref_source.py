"""tf.data DataSource injected into the REFERENCE trainer for the twin run.

tools/twin_ref_runner.py registers this module in sys.modules as
`big_vision.datasets.twin_data` BEFORE the reference trainer resolves
`config.input.data.name = "bv:twin_data"` — the reference's own custom-
dataset hook (ref datasets/core.py:71-77) then imports and instantiates
it unmodified. The source reads a .npz of pre-preprocessed arrays and
serves them strictly in file order via tf.data.from_tensor_slices, so
the batch stream the reference sees is bit-identical to the one this
repo's `arrays` source produces from its (differently ordered) twin file.
"""

import numpy as np


class DataSource:
  """Reference-API data source over an .npz of equal-length arrays."""

  def __init__(self, npz):
    self.data = {k: np.asarray(v) for k, v in dict(np.load(npz)).items()}
    lengths = {k: len(v) for k, v in self.data.items()}
    assert len(set(lengths.values())) == 1, f"ragged npz: {lengths}"
    self._n = next(iter(lengths.values()))

  def get_tfdata(self, ordered, *, process_split=True, allow_cache=True):
    del ordered, process_split, allow_cache  # single-process, file order
    import tensorflow as tf
    return tf.data.Dataset.from_tensor_slices(self.data)

  @property
  def total_examples(self):
    return self._n

  def num_examples_per_process(self):
    return [self._n]
