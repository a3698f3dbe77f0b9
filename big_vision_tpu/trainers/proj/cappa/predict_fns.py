"""CaPPa prediction functions: perplexity, scoring classifier, encoder rep.

Parity target: reference trainers/proj/cappa/predict_fns.py. `score` rates
every class caption's log-likelihood per image (used by the
proj/cappa/scoring_classifier evaluator); lax.map over labels keeps memory
bounded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.pp import tokenizer as bvt_tokenizer


def predict_fn_perplexity(train_state, batch, *, model):
  logits = model.apply({"params": train_state["params"]}, batch["image"],
                       batch["labels"], train=False)
  if isinstance(logits, tuple):
    logits = logits[0]
  return logits, {"logits": logits}


def predict_fn_enc_rep(train_state, batch, *, model):
  encoded, out = model.apply(
      {"params": train_state["params"]}, batch["image"], train=False,
      return_enc_features=True, method=model.encode)
  return encoded, out


def predict_fn_score(train_state, batch, *, model, prompt="",
                     prompt_tokenizer=""):
  """Log-likelihood of each class caption for each image: [B, n_labels]."""
  encoded = model.apply({"params": train_state["params"]}, batch["image"],
                        train=False, method=model.encode)

  # Injected by the scoring_classifier evaluator: [n_labels, len] int32.
  all_labels = batch["_label_tokens"]

  if prompt and prompt_tokenizer:
    prompt_ids = make_prompt(prompt, prompt_tokenizer)
    prompts = jnp.tile(jnp.asarray(prompt_ids), (all_labels.shape[0], 1))
    all_labels = jnp.concatenate([prompts, all_labels], axis=-1)

  def score_label(label):
    label_rep = jnp.tile(label, (encoded.shape[0], 1))
    logits = model.apply(
        {"params": train_state["params"]}, encoded, label_rep,
        decode=False, train=False, method=model.decode)
    return -u.weighted_softmax_xent(
        logits=logits, labels=label_rep,
        weights=(label_rep > 0).astype(jnp.float32),  # Ignore <PAD> (=0).
        reduction=False, normalize=False)

  nlls = jax.lax.map(score_label, all_labels)  # [n_labels, B]
  return nlls.T


@functools.cache
def make_prompt(prompt, tokenizer_spec, seq_len=None):
  """Tokenizes `prompt` (no eos), optionally zero-padded to seq_len."""
  tok = bvt_tokenizer.get_tokenizer(tokenizer_spec)
  ids = np.asarray(tok.to_int(prompt, bos=False, eos=False), np.int32)
  if seq_len:
    ids = np.pad(ids, (0, seq_len - len(ids))).astype(np.int32)
  return tuple(ids.tolist())  # Hashable for the cache.


def get_predict_fns(model):
  fns = {"perplexity": predict_fn_perplexity,
         "score": predict_fn_score,
         "enc_rep": predict_fn_enc_rep}
  return {name: functools.partial(fn, model=model)
          for name, fn in fns.items()}
