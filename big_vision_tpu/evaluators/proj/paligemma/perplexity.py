"""Masked-CE perplexity evaluator for prefix-LM models.

Parity target: reference evaluators/proj/paligemma/perplexity.py:29-63 —
wraps the `logits` predict_fn in a per-example masked-NLL computation
(`sum` and `avg` keys) and mean-reduces it over the dataset. Configs use
it as `dict(type="proj.paligemma.perplexity", pred="logits", key="text",
shift_labels=True, ...)`.
"""

import functools

from big_vision_tpu.evaluators import mean
import big_vision_tpu.utils as u
import jax.numpy as jnp

API = "jit"


@functools.cache
def perplexity(predict_fn, key="labels", shift_labels=True, pad_token=None):
  """Per-example {sum, avg} NLL from a (logits, out) predict_fn."""

  def _perplexity_fn(train_state, batch, **kw):
    out = predict_fn(train_state, batch, **kw)
    if isinstance(out, dict):
      # pred="perplexity": the trainer already computed per-example
      # metrics; mean-reduce them as-is (smoke configs use this form).
      return out
    logits, _ = out
    labels = batch[key]
    weights = batch.get("mask_loss", jnp.ones_like(labels))
    if pad_token is not None:
      weights = weights * (labels != pad_token).astype(jnp.float32)
    if shift_labels:
      # logits[:, i] predicts labels[:, i+1] (same alignment as the
      # trainer's loss, trainers/proj/paligemma/train.py).
      logits_ = logits[:, :-1]
      labels = labels[:, 1:]
      weights = weights[:, 1:]
    else:
      logits_ = logits
    losses = u.weighted_softmax_xent(
        logits=logits_, labels=labels, weights=weights,
        reduction=False, normalize=False)
    normalizer = jnp.clip(weights.sum(axis=1), 2e-38)
    return {"sum": losses, "avg": losses / normalizer}

  return _perplexity_fn


class Evaluator(mean.Evaluator):
  """Perplexity evaluator (mean-reduced masked CE)."""

  def __init__(self, predict_fn, *a, key="labels", shift_labels=False,
               pad_token=None, **kw):
    super().__init__(
        perplexity(predict_fn, key, shift_labels, pad_token), *a, **kw)
