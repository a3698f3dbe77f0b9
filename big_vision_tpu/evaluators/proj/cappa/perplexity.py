"""Caption perplexity: dataset-mean of per-example padded softmax xent.

Parity target: reference evaluators/proj/cappa/perplexity.py — a thin
adapter over the `mean` evaluator. Per-example value: softmax xent of the
predicted logits against `labels`, pad positions (and, when present,
`label_masks`-suppressed positions) excluded, optionally normalized by the
unpadded length.
"""

from __future__ import annotations

import jax.numpy as jnp

import big_vision_tpu.utils as u
from big_vision_tpu.evaluators import mean

API = "jit"


class Evaluator(mean.Evaluator):
  """Mean per-example caption perplexity."""

  def __init__(self, predict_fn, *a, normalize_by_seqlen=False, **kw):

    def per_example_nll(train_state, batch, pad_token=0, **ikw):
      logits, _ = predict_fn(train_state, batch, **ikw)
      labels = batch["labels"]
      keep = (labels != pad_token).astype(jnp.float32)
      extra_mask = batch.get("label_masks")
      if extra_mask is not None:
        keep = keep * extra_mask
      nll = u.weighted_softmax_xent(
          logits=logits, labels=labels, weights=keep, reduction=False,
          label_smoothing=0.0, normalize=normalize_by_seqlen)
      return {"perplexity": nll}

    super().__init__(per_example_nll, *a, **kw)
