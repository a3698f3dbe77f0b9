"""CaPPa prediction functions: perplexity, scoring classifier, encoder rep.

Parity target: reference trainers/proj/cappa/predict_fns.py. The trainer
hands these to evaluators keyed by `pred`: "perplexity" feeds the
proj.cappa.perplexity evaluator, "enc_rep" feeds fewshot probes, and
"score" rates every class caption's log-likelihood per image for the
proj/cappa/scoring_classifier evaluator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.pp import tokenizer as bvt_tokenizer


@functools.cache
def make_prompt(prompt, tokenizer_spec, seq_len=None):
  """Tokenizes `prompt` (no bos/eos), optionally zero-padded to seq_len."""
  tok = bvt_tokenizer.get_tokenizer(tokenizer_spec)
  ids = np.asarray(tok.to_int(prompt, bos=False, eos=False), np.int32)
  if seq_len:
    ids = np.pad(ids, (0, seq_len - len(ids))).astype(np.int32)
  return tuple(ids.tolist())  # Hashable for the cache.


def get_predict_fns(model):
  """Builds the evaluator-facing prediction fns around one model."""

  def run(train_state, *args, **kw):
    return model.apply({"params": train_state["params"]}, *args, **kw)

  def perplexity(train_state, batch):
    logits = run(train_state, batch["image"], batch["labels"], train=False)
    if isinstance(logits, tuple):
      logits = logits[0]
    return logits, {"logits": logits}

  def enc_rep(train_state, batch):
    return run(train_state, batch["image"], train=False,
               return_enc_features=True, method=model.encode)

  def score(train_state, batch, prompt="", prompt_tokenizer=""):
    """Log-likelihood of each class caption per image: [B, n_labels]."""
    encoded = run(train_state, batch["image"], train=False,
                  method=model.encode)

    # Injected by the scoring_classifier evaluator: [n_labels, len] int32
    # tokenized class captions, optionally prefixed by one shared prompt.
    captions = batch["_label_tokens"]
    if prompt and prompt_tokenizer:
      prefix = jnp.asarray(make_prompt(prompt, prompt_tokenizer))
      prefix = jnp.tile(prefix, (captions.shape[0], 1))
      captions = jnp.concatenate([prefix, captions], axis=-1)

    def caption_ll(tokens):
      per_image = jnp.tile(tokens, (encoded.shape[0], 1))
      logits = run(train_state, encoded, per_image, decode=False,
                   train=False, method=model.decode)
      # Negated xent = log-likelihood; PAD (=0) positions excluded.
      return -u.weighted_softmax_xent(
          logits=logits, labels=per_image,
          weights=(per_image > 0).astype(jnp.float32),
          reduction=False, normalize=False)

    # lax.map (not vmap): one caption at a time bounds activation memory
    # at n_labels=1000 scale; each step is still a full-batch MXU matmul.
    scores = jax.lax.map(caption_ll, captions)  # [n_labels, B]
    return scores.T

  return {"perplexity": perplexity, "score": score, "enc_rep": enc_rep}
