"""Perplexity evaluator for captioning models (mean over examples).

Parity target: reference evaluators/proj/cappa/perplexity.py — a thin
wrapper over the `mean` evaluator whose per-example value is the padded,
optionally length-normalized softmax xent of the predicted logits.
"""

from __future__ import annotations

import jax.numpy as jnp

import big_vision_tpu.utils as u
from big_vision_tpu.evaluators import mean

API = "jit"


def perplexity(predict_fn, normalize_by_seqlen):
  def _perplexity_fn(train_state, batch, pad_token=0, **kw):
    logits, _ = predict_fn(train_state, batch, **kw)
    weights = jnp.where(batch["labels"] != pad_token, 1, 0).astype(
        jnp.float32)
    if batch.get("label_masks") is not None:
      weights = weights * batch["label_masks"]
    losses = u.weighted_softmax_xent(
        logits=logits, labels=batch["labels"], weights=weights,
        label_smoothing=0.0, reduction=False,
        normalize=normalize_by_seqlen)
    return {"perplexity": losses}
  return _perplexity_fn


class Evaluator(mean.Evaluator):
  """Mean per-example caption perplexity."""

  def __init__(self, predict_fn, *a, normalize_by_seqlen=False, **kw):
    super().__init__(perplexity(predict_fn, normalize_by_seqlen), *a, **kw)
