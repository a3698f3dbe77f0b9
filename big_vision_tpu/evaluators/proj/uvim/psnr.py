"""PSNR evaluator (colorization / superresolution).

Parity target: reference evaluators/proj/uvim/psnr.py (pmap era), redone
jit-style over the shared eval input pipeline. `predict_fn` returns a
single-key dict with an RGB image in [-1, 1]; PSNR is computed against
batch["labels"] with dynamic range 2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.evaluators.common as c

API = "jit"


@functools.partial(jax.vmap, in_axes=[0, 0, None])
def _psnr(img0, img1, dynamic_range):
  mse = jnp.mean(jnp.square(img0 - img1))
  return 20.0 * jnp.log10(dynamic_range) - 10.0 * jnp.log10(mse)


class Evaluator:
  """Mean PSNR over the split."""

  def __init__(self, predict_fn, predict_kwargs=None, *, data, devices,
               **kw):
    self.get_data_iter, self.steps = c.eval_input_pipeline(
        data=data, devices=devices, **kw)
    self.predict_fn = predict_fn
    self.predict_kwargs = predict_kwargs or {}

  def run(self, train_state):
    psnrs, nseen = 0.0, 0
    for _, batch in zip(range(self.steps), self.get_data_iter()):
      dev_batch, _ = c.split_batch(batch)
      y = self.predict_fn(train_state, dev_batch, **self.predict_kwargs)
      # Single-item dict contract; "logits" wins when the predict fn also
      # reports side outputs (e.g. GIVT sampling logprobs).
      pred = y["logits"] if "logits" in y else next(iter(y.values()))
      vals = jax.device_get(_psnr(pred, dev_batch["labels"], 2.0))
      mask = np.asarray(jax.device_get(dev_batch["_mask"])).astype(bool)
      psnrs += float(np.sum(np.asarray(vals)[mask]))
      nseen += int(mask.sum())
    total, n = c.process_sum([psnrs, nseen])
    if n:
      yield "PSNR", total / n
