"""Mean evaluator: averages per-example scalars from a predict_fn.

Parity target: reference big_vision/evaluators/mean.py. The predict_fn
returns a dict of per-example values [local_batch, ...]; this evaluator
mask-averages each over the dataset.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from big_vision_tpu.evaluators import common

API = "jit"


@functools.cache
def get_eval_fn(predict_fn):
  @jax.jit
  def _eval_fn(train_state, batch):
    mask = batch["_mask"]
    outputs = predict_fn(train_state, batch)
    outputs = {k: v.reshape(v.shape[0], -1).mean(axis=-1)
               for k, v in outputs.items()}
    return ({k: jnp.sum(v * mask) for k, v in outputs.items()},
            jnp.sum(mask))
  return _eval_fn


class Evaluator:

  def __init__(self, predict_fn, **kw):
    self.get_data_iter, self.steps = common.eval_input_pipeline(**kw)
    self.eval_fn = get_eval_fn(predict_fn)

  def run(self, train_state):
    sums, nseen = None, 0
    for _, batch in zip(range(self.steps), self.get_data_iter()):
      batch, _ = common.split_batch(batch)
      batch_sums, batch_n = jax.device_get(self.eval_fn(train_state, batch))
      nseen += batch_n
      sums = (batch_sums if sums is None else
              jax.tree.map(lambda a, b: a + b, sums, batch_sums))
    for k, v in (sums or {}).items():
      yield (k, v / nseen)
