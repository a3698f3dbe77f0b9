"""Dummy DataSource: zero-filled examples with a declared spec.

The reference's load_and_eval config points its (never-consumed) training
input at `bv:dummy` with a `spec` describing shapes/dtypes (ref
configs/load_and_eval.py:46 — the module itself is absent from the public
snapshot, so this implements the documented behavior). Used to drive the
trainer in eval-only mode (total_steps=0) where the data only defines
model-init shapes.

  data=dict(name="bv:dummy", spec=dict(
      image=dict(shape=(224, 224, 3), dtype="float32")))
"""

from __future__ import annotations

import numpy as np

from big_vision_tpu.datasets import core


class DataSource(core.DataSource):

  def __init__(self, *, spec, n=64, split=None):
    del split
    self.spec = dict(spec)
    self.total_examples = n
    self._start, self._stop = core.process_split(n)

  def num_examples_per_process(self):
    return self._stop - self._start

  def _example(self, i):
    ex = {k: np.zeros(dict(v)["shape"], dict(v)["dtype"])
          for k, v in self.spec.items()}
    ex["_id"] = np.int64(i)
    return ex

  def get_examples(self, *, ordered, seed=0, epoch=0):
    del ordered, seed, epoch
    for i in range(self._start, self._stop):
      yield self._example(i)
