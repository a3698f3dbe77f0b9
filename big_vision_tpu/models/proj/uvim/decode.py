"""Autoregressive decoding for encoder-decoder models (UViM / VTT / CapPa).

Parity target: reference models/proj/uvim/decode.py (temperature/topk/
nucleus/argmax sampling over a flax decode cache; sample-dim expansion for
num_samples > 1). The loop is a single jitted lax.while_loop with on-device
eos tracking (no per-token host syncs).
"""

from __future__ import annotations


import flax
import jax
import numpy as np
from flax import linen as nn
from jax import numpy as jnp

EOS_ID = 1
NEG_INF = np.array(-1.0e7)


def temperature_sampling(*args, temperature=1.0, top_k=0, top_p=0.0, **kw):
  return generate(*args, temperature=temperature, top_k=top_k, top_p=top_p,
                  **kw)


def topk_sampling(*args, temperature=1.0, top_k=20, **kw):
  return generate(*args, temperature=temperature, top_k=top_k, top_p=0.0,
                  **kw)


def nucleus_sampling(*args, temperature=1.0, top_p=0.2, **kw):
  return generate(*args, temperature=temperature, top_k=0, top_p=top_p,
                  **kw)


def argmax_sampling(*args, **kw):
  return generate(*args, temperature=1e-7, top_k=0, top_p=0.0, **kw)


def expand_samples_dim(x, num_samples):
  if x.ndim == 0:
    return x
  x = jnp.expand_dims(x, axis=1)
  tile = [1] * x.ndim
  tile[1] = num_samples
  return jnp.tile(x, tile)


def flatten_samples_dim(x):
  if x.ndim == 0:
    return x
  return x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])


def unflatten_samples_dim(x, batch_size, num_samples):
  if x.ndim == 0:
    return x
  return x.reshape((batch_size, num_samples) + x.shape[1:])


def expand_samples_dim_and_flatten(x, num_samples):
  return flatten_samples_dim(expand_samples_dim(x, num_samples))


def cache_map(fn, cache):
  frozen = isinstance(cache, flax.core.FrozenDict)
  if frozen:
    cache = flax.core.unfreeze(cache)
  flat = flax.traverse_util.flatten_dict(cache)
  keyvals = {k: v for k, v in flat.items() if k[-1] != "cached_bias"}
  keyvals = jax.tree.map(fn, keyvals)
  flat.update(keyvals)
  out = flax.traverse_util.unflatten_dict(flat)
  return flax.core.freeze(out) if frozen else out


def _mask_logits(logits, temperature, top_k, top_p, mask_token_ids=()):
  logits = logits / jnp.maximum(temperature, 1e-7)
  if mask_token_ids:
    mask = jnp.ones(logits.shape[-1], bool).at[
        jnp.asarray(mask_token_ids)].set(False)
    logits = jnp.where(mask[None], logits, NEG_INF)
  if top_k:
    kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
    logits = jnp.where(logits < kth, NEG_INF, logits)
  if top_p:
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
    cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
    logits = jnp.where(logits < cutoff, NEG_INF, logits)
  return logits


def generate(params, inputs, prompts, seed, *, model: nn.Module,
             num_samples=1, prefill=False, eos_token=EOS_ID,
             temperature=1.0, top_k=0, top_p=0.0, mask_token_ids=(),
             **unused):
  """Sampled AR generation; returns (sequences [B, N, L], scores [B, N],
  logprobs [B, N, L]). Sequences sorted worst-to-best per example."""
  del unused
  batch_size, max_decode_len = prompts.shape
  decode_kwargs = {"max_decode_length": max_decode_len}

  def encode(model, inputs):
    if not isinstance(inputs, tuple):
      inputs = (inputs,)
    return model.encode(*inputs)

  encoded_inputs = nn.apply(encode, model)(params, inputs)

  def init_cache(model):
    encoded = jnp.zeros_like(encoded_inputs)
    targets = jnp.zeros_like(prompts)
    return model.decode(encoded, targets, decode=True, **decode_kwargs)

  cache = nn.apply(init_cache, model, mutable=True)(params)[1]["cache"]
  del prefill  # Prefill-from-prompt arrives with the prompted tasks.

  encoded_rep = expand_samples_dim_and_flatten(encoded_inputs, num_samples)

  def tokens_to_logits(tokens, cache):
    def decode_step(model, tokens):
      return model.decode(encoded_rep, tokens, decode=True, **decode_kwargs)
    logits, aux = nn.apply(decode_step, model, mutable=True)(
        {"params": params["params"], "cache": cache}, tokens)
    return logits.squeeze(axis=1), aux["cache"]

  cache = cache_map(
      lambda x: expand_samples_dim_and_flatten(x, num_samples), cache)
  bn = batch_size * num_samples
  sequences0 = jnp.zeros((bn, max_decode_len + 1), jnp.int32)
  sequences0 = sequences0.at[:, 1:].set(
      expand_samples_dim_and_flatten(prompts, num_samples))

  prompts_rep = expand_samples_dim_and_flatten(prompts, num_samples)

  def cond(state):
    i, _, finished, *_ = state
    return jnp.logical_and(i < max_decode_len, ~jnp.all(finished))

  def body(state):
    i, cache, finished, sequences, scores, logprobs, rng = state
    rng, rng_step = jax.random.split(rng)
    cur = sequences[:, i]
    logits, cache = tokens_to_logits(cur[:, None], cache)
    logp_full = jax.nn.log_softmax(logits)
    masked = _mask_logits(logits, temperature, top_k, top_p,
                          mask_token_ids)
    sampled = jax.random.categorical(rng_step, masked, axis=-1)
    # Forced prompt tokens (nonzero) override sampling.
    forced = prompts_rep[:, i]
    tok = jnp.where(forced > 0, forced, sampled)
    tok = jnp.where(finished, 0, tok)
    tok_logp = jnp.take_along_axis(logp_full, tok[:, None], axis=-1)[:, 0]
    tok_logp = jnp.where(finished, 0.0, tok_logp)
    sequences = sequences.at[:, i + 1].set(tok)
    logprobs = logprobs.at[:, i].set(tok_logp)
    scores = scores + tok_logp
    finished = jnp.logical_or(finished, tok == eos_token)
    return (i + 1, cache, finished, sequences, scores, logprobs, rng)

  init = (jnp.asarray(0), cache, jnp.zeros((bn,), bool), sequences0,
          jnp.zeros((bn,)), jnp.zeros((bn, max_decode_len)), seed)
  _, _, sequences, scores, logprobs, _ = jax.lax.while_loop(
      cond, body, init)[1:]

  seqs = unflatten_samples_dim(sequences[:, 1:], batch_size, num_samples)
  scores = unflatten_samples_dim(scores, batch_size, num_samples)
  logprobs = unflatten_samples_dim(logprobs, batch_size, num_samples)
  # Sort samples by score, worst first (reference convention).
  order = jnp.argsort(scores, axis=1)
  seqs = jnp.take_along_axis(seqs, order[:, :, None], axis=1)
  logprobs = jnp.take_along_axis(logprobs, order[:, :, None], axis=1)
  scores = jnp.take_along_axis(scores, order, axis=1)
  return seqs, scores, logprobs
