"""In-memory DataSource over a dict of equal-length arrays/lists (tests)."""

from __future__ import annotations

import numpy as np

from big_vision_tpu.datasets import core


class DataSource(core.DataSource):
  """data={"image": [...], "label": [...]}; all values same length.

  Alternatively pass npz="/path/file.npz" to read the arrays from disk
  (so file-based configs can name an in-memory-style source).
  """

  def __init__(self, data=None, npz=None, split=None):
    del split
    if npz is not None:
      assert data is None, "pass either data= or npz=, not both"
      data = dict(np.load(npz))
    lengths = {k: len(v) for k, v in data.items()}
    assert len(set(lengths.values())) == 1, f"Ragged source: {lengths}"
    self.data = data
    self.total_examples = next(iter(lengths.values()))
    self._start, self._stop = core.process_split(self.total_examples)

  def num_examples_per_process(self):
    return self._stop - self._start

  def get_examples(self, *, ordered, seed=0, epoch=0):
    idx = np.arange(self._start, self._stop)
    if not ordered:
      rng = np.random.default_rng((seed, epoch))
      idx = rng.permutation(idx)
    for i in idx:
      yield {**{k: v[i] for k, v in self.data.items()},
             "_id": np.int64(i)}
