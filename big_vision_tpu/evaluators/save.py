"""Save evaluator: dumps inputs/outputs of a predict_fn to an .npz.

Parity target: reference big_vision/evaluators/save.py. Useful for offline
inspection and as a debugging harness for new models.
"""

from __future__ import annotations

import os

import jax
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.evaluators import common

API = "jit"


class Evaluator:

  def __init__(self, predict_fn, outfile, keys=None, **kw):
    self.get_data_iter, self.steps = common.eval_input_pipeline(**kw)
    self.predict_fn = jax.jit(predict_fn)
    self.outfile = outfile
    self.keys = keys

  def run(self, train_state):
    rows = []
    for _, batch in zip(range(self.steps), self.get_data_iter()):
      outputs = self.predict_fn(train_state, batch)
      if not isinstance(outputs, dict):
        outputs = {"output": outputs[0] if isinstance(outputs, tuple)
                   else outputs}
      record = {**{k: v for k, v in batch.items()
                   if isinstance(v, jax.Array)}, **outputs}
      mask = np.asarray(u.get_local_slice_from_fsarray(batch["_mask"]))
      record = {k: np.asarray(u.get_local_slice_from_fsarray(v))[mask == 1]
                for k, v in record.items()
                if self.keys is None or k in self.keys}
      rows.append(record)
    merged = {k: np.concatenate([r[k] for r in rows]) for k in rows[0]}
    outfile = self.outfile.format(step=u.chrono.prev_step)
    if jax.process_index() == 0:
      os.makedirs(os.path.dirname(os.path.abspath(outfile)), exist_ok=True)
      np.savez(outfile, **merged)
    yield ("saved", 1.0)
