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
  @jax.jit
  def _eval_fn(train_state, batch, labels, mask):
    logits, *_ = predict_fn(train_state, batch)
    mask = mask * labels.max(axis=1)  # ignore all-zero label rows
    loss = getattr(u, loss_name)(logits=logits, labels=labels,
                                 reduction=False)
    loss = jnp.sum(loss * mask)
    top1 = jnp.argmax(logits, axis=1)
    correct = jnp.take_along_axis(labels, top1[:, None], axis=1)[:, 0]
    return jnp.sum(correct * mask), loss, jnp.sum(mask)
  return _eval_fn


class Evaluator:

  def __init__(self, predict_fn, loss_name, label_key="labels", **kw):
    self.get_data_iter, self.steps = common.eval_input_pipeline(**kw)
    self.eval_fn = get_eval_fn(predict_fn, loss_name)
    self.label_key = label_key

  def run(self, train_state):
    ncorrect, loss, nseen = 0, 0, 0
    for _, batch in zip(range(self.steps), self.get_data_iter()):
      batch, _ = common.split_batch(batch)
      labels, mask = batch.pop(self.label_key), batch.pop("_mask")
      batch.pop("_id", None)
      nc, l, ns = jax.device_get(
          self.eval_fn(train_state, batch, labels, mask))
      ncorrect += nc
      loss += l
      nseen += ns
    yield ("prec@1", ncorrect / nseen)
    yield ("loss", loss / nseen)
