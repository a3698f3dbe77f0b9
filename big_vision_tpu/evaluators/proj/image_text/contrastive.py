"""Minibatch contrastive health metrics (loss + ncorrect).

Parity target: reference evaluators/proj/image_text/contrastive.py, rebuilt
on the jit/global-array API (the reference version is pmap-legacy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

import big_vision_tpu.utils as u
from big_vision_tpu.evaluators import common

API = "jit"


@functools.cache
def get_eval_fn(predict_fn, use_global_batch):
  del use_global_batch

  @jax.jit
  def _eval_fn(train_state, batch):
    zimg, ztxt, out = predict_fn(train_state, batch)
    mask = batch.get("_mask")
    loss, extras = u.bidirectional_contrastive_loss(
        zimg, ztxt, out["t"][0], mask=mask, reduction=True)
    nseen = jnp.sum(mask) if mask is not None else zimg.shape[0]
    return loss * nseen, extras["ncorrect"] * nseen, nseen
  return _eval_fn


class Evaluator:

  def __init__(self, predict_fn, use_global_batch=True, **kw):
    self.get_data_iter, self.steps = common.eval_input_pipeline(**kw)
    self.eval_fn = get_eval_fn(predict_fn, use_global_batch)

  def run(self, train_state):
    loss, ncorrect, nseen = 0.0, 0.0, 0
    for _, batch in zip(range(self.steps), self.get_data_iter()):
      batch, _ = common.split_batch(batch)
      l, nc, ns = jax.device_get(self.eval_fn(train_state, batch))
      loss += l
      ncorrect += nc
      nseen += ns
    yield ("loss", loss / nseen)
    yield ("ncorrect_minibatch", ncorrect / nseen)
