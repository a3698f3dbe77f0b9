"""Evaluator that runs predict_fn over a split and saves outputs to npz.

Parity target: reference evaluators/proj/givt/save_predictions.py. Outputs
land in {workdir}/{outfile} as a compressed npz of flattened-name arrays,
loadable for notebook inspection.
"""

from __future__ import annotations

import io
import os

import jax
import numpy as np

import big_vision_tpu.evaluators.common as c
import big_vision_tpu.utils as u

API = "jit"


class Evaluator:
  """Saves {inputs, outputs} for every (non-padding) example."""

  def __init__(self, predict_fn, outfile, *, data, devices, **kw):
    self.get_data_iter, self.steps = c.eval_input_pipeline(
        data=data, devices=devices, **kw)
    self.predict_fn = predict_fn
    self.outfile = c.resolve_outfile(
        os.path.join("{workdir}", outfile), split=data.get("split", ""))

  def run(self, train_state):
    count, outputs = 0, []
    for _, batch in zip(range(self.steps), self.get_data_iter()):
      dev_batch, _ = c.split_batch(batch)
      y = self.predict_fn(train_state, dev_batch)
      out = jax.device_get({"inputs": dev_batch, "outputs": y,
                            "mask": dev_batch["_mask"]})
      mask = out["mask"].astype(bool)
      out = jax.tree.map(lambda x, m=mask: np.asarray(x)[m], out)
      count += int(out.pop("mask").shape[0])
      outputs.append(out)

    if jax.process_index():
      return
    outputs = jax.tree.map(lambda *x: np.concatenate(x, axis=0), *outputs)
    names_and_vals, _ = u.tree_flatten_with_names(outputs)
    if self.outfile:
      buf = io.BytesIO()
      np.savez_compressed(buf, **dict(names_and_vals))
      os.makedirs(os.path.dirname(os.path.abspath(self.outfile)),
                  exist_ok=True)
      with open(self.outfile, "wb") as f:
        f.write(buf.getvalue())
    yield "num_examples", count
