"""GIVT decoding: autoregressive GMM sampling with a KV cache.

Parity target: reference models/proj/givt/decode.py (_sample_gmm :29,
generate :138). One jitted lax.while_loop; each step samples a continuous
token from the predicted GMM and extends the flax decode cache.
Density-based CFG (reference parallel_decode.py:264) is approximated by
loc-shifting guidance on the mixture means when cfg_weight > 0.
"""

from __future__ import annotations

import flax
import jax
import jax.numpy as jnp
from flax import linen as nn


def generate(params, model, seed, *, batch_size, seq_len=None, labels=None,
             encoded=None, temperature_scales=None, temperature_probs=None,
             cfg_weight=0.0):
  """Samples [B, L, out_dim] continuous token sequences."""
  seq_len = seq_len or model.seq_len

  def prefill(m):
    return m.prefill(labels=labels, batch_size=batch_size, encoded=encoded)

  def init_cache(m):
    dummy = jnp.zeros((batch_size, 1, model.out_dim))
    return m.decode(dummy, encoded=encoded, decode=True)

  # `params` is the full variables dict ({"params": ...}).
  # Build the cache structure, then run the label-token prefill step.
  _, vars0 = nn.apply(init_cache, model, mutable=True)(params)
  cache = vars0["cache"]
  logits0, vars1 = nn.apply(prefill, model, mutable=True)(
      {**params, "cache": cache})
  cache = vars1["cache"]

  def step_logits(tok, cache):
    def run(m, tok):
      return m.decode(tok, encoded=encoded, decode=True)
    logits, aux = nn.apply(run, model, mutable=True)(
        {**params, "cache": cache}, tok)
    return logits, aux["cache"]

  def sample_token(logits, rng):
    pdf = model.get_pdf(logits, temperature_scales=temperature_scales,
                        temperature_probs=temperature_probs)
    tok = pdf.sample(seed=rng)
    if cfg_weight and labels is not None:
      # Mean-guidance approximation: push the sample away from the
      # unconditional mean (the exact DB-CFG rejection sampler is richer).
      tok = tok + cfg_weight * (tok - pdf.mean())
    return tok

  rngs = jax.random.split(seed, seq_len)

  def cond(state):
    i, *_ = state
    return i < seq_len

  def body(state):
    i, cache, last_logits, tokens = state
    tok = sample_token(last_logits[:, -1:], rngs[i])  # [B, 1, D]
    tokens = jax.lax.dynamic_update_slice(tokens, tok, (0, i, 0))
    new_logits, cache = jax.lax.cond(
        i + 1 < seq_len,
        lambda: step_logits(tok, cache),
        lambda: (last_logits, cache))
    return (i + 1, cache, new_logits, tokens)

  tokens0 = jnp.zeros((batch_size, seq_len, model.out_dim))
  _, _, _, tokens = jax.lax.while_loop(
      cond, body, (jnp.asarray(0), cache, logits0, tokens0))
  return tokens


def cache_map(fn, cache):
  frozen = isinstance(cache, flax.core.FrozenDict)
  if frozen:
    cache = flax.core.unfreeze(cache)
  flat = flax.traverse_util.flatten_dict(cache)
  flat = {k: fn(v) for k, v in flat.items()}
  out = flax.traverse_util.unflatten_dict(flat)
  return flax.core.freeze(out) if frozen else out
