"""Masked-CE perplexity evaluator for prefix-LM models.

Parity target: reference evaluators/proj/paligemma/perplexity.py:29-63 —
wraps the `logits` predict_fn in a per-example masked-NLL computation
(`sum` and `avg` keys) and mean-reduces it over the dataset. Configs use
it as `dict(type="proj.paligemma.perplexity", pred="logits", key="text",
shift_labels=True, ...)`.
"""

import functools

import jax.numpy as jnp

import big_vision_tpu.utils as u
from big_vision_tpu.evaluators import mean

API = "jit"


# Memoized so that several evaluator instances with identical settings
# (e.g. val + test perplexity) share one closure and thus one jit cache
# entry inside mean.get_eval_fn.
@functools.lru_cache(maxsize=None)
def _nll_fn(predict_fn, key, shift_labels, pad_token):
  """Builds the per-example masked-NLL fn for `mean` reduction."""

  def per_example_nll(train_state, batch, **ikw):
    pred = predict_fn(train_state, batch, **ikw)
    if isinstance(pred, dict):
      # pred="perplexity": the trainer already computed per-example
      # metrics; mean-reduce them as-is (smoke configs use this form).
      return pred

    logits = pred[0]
    labels = batch[key]
    keep = batch.get("mask_loss")
    if keep is None:
      keep = jnp.ones_like(labels)
    if pad_token is not None:
      keep = jnp.where(labels == pad_token, 0.0, keep)
    if shift_labels:
      # logits[:, i] predicts labels[:, i+1] (same alignment as the
      # trainer's loss, trainers/proj/paligemma/train.py).
      logits, labels, keep = logits[:, :-1], labels[:, 1:], keep[:, 1:]

    nll = u.weighted_softmax_xent(
        labels=labels, logits=logits, weights=keep,
        normalize=False, reduction=False)
    denom = jnp.maximum(jnp.sum(keep, axis=-1), 2e-38)
    return {"sum": nll, "avg": nll / denom}

  return per_example_nll


def Evaluator(predict_fn, *args, shift_labels=False, key="labels",
              pad_token=None, **kw):
  """Perplexity evaluator (mean-reduced masked CE)."""
  fn = _nll_fn(predict_fn, key, shift_labels, pad_token)
  return mean.Evaluator(fn, *args, **kw)
