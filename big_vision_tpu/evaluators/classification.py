"""Top-1 / loss classification evaluator (jit, multi-host exact).

Parity target: reference big_vision/evaluators/classification.py:34-77.
Correctness rests on the inference pipeline's _mask contract: every process
runs the same number of jitted global reductions; padded rows have mask 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

import big_vision_tpu.utils as u
from big_vision_tpu.evaluators import common

API = "jit"


@functools.cache
def get_eval_fn(predict_fn, loss_name):
  """One jitted global-reduction step returning masked metric sums."""
  per_example_loss = getattr(u, loss_name)

  @jax.jit
  def batch_sums(train_state, batch, labels, mask):
    outputs = predict_fn(train_state, batch)
    logits = outputs[0]
    mask = mask * labels.max(axis=1)  # ignore all-zero label rows
    top1 = jnp.argmax(logits, axis=1)[:, None]
    hit = jnp.take_along_axis(labels, top1, axis=1).squeeze(1)
    loss = per_example_loss(logits=logits, labels=labels, reduction=False)
    return {"prec@1": jnp.sum(hit * mask),
            "loss": jnp.sum(loss * mask),
            "n": jnp.sum(mask)}

  return batch_sums


class Evaluator:

  def __init__(self, predict_fn, loss_name, label_key="labels", **kw):
    self.get_data_iter, self.steps = common.eval_input_pipeline(**kw)
    self.label_key = label_key
    self.eval_fn = get_eval_fn(predict_fn, loss_name)

  def run(self, train_state):
    totals = {"prec@1": 0.0, "loss": 0.0, "n": 0.0}
    data = self.get_data_iter()
    for _, raw in zip(range(self.steps), data):
      batch, _ = common.split_batch(raw)
      mask = batch.pop("_mask")
      labels = batch.pop(self.label_key)
      batch.pop("_id", None)
      part = self.eval_fn(train_state, batch, labels, mask)
      part = jax.device_get(part)
      totals = {k: totals[k] + part[k] for k in totals}
    for key in ("prec@1", "loss"):
      yield (key, totals[key] / totals["n"])
