"""GIVT decoding: autoregressive GMM sampling with a KV cache.

Parity target: reference models/proj/givt/decode.py (_sample_gmm :29,
generate :138). One jitted lax.while_loop; each step samples a continuous
token from the predicted GMM and extends the flax decode cache.

Density-based CFG (reference parallel_decode.py:264, CFGDensity) is exact:
with cfg_weight > 0 a second, unconditional decode stream (labels dropped,
its own KV cache) runs in lockstep, and each token is drawn from
p_c^(1+w)/p_u^w by vectorized rejection sampling
(distributions.GaussianCFG). `cfg_fast_approx=True` selects the cheaper
loc-shift approximation (single stream, no rejection loop) for serving.
"""

from __future__ import annotations

import flax
import jax
import jax.numpy as jnp
from flax import linen as nn

from big_vision_tpu.models.proj.givt import distributions


def generate(params, model, seed, *, batch_size, seq_len=None, labels=None,
             encoded=None, temperature_scales=None, temperature_probs=None,
             cfg_weight=0.0, cfg_fast_approx=False):
  """Samples [B, L, out_dim] continuous token sequences."""
  seq_len = seq_len or model.seq_len
  cfg = bool(cfg_weight) and labels is not None and not cfg_fast_approx

  def make_cache(drop_labels):
    def init_cache(m):
      dummy = jnp.zeros((batch_size, 1, model.out_dim))
      return m.decode(dummy, encoded=encoded, decode=True)

    def prefill(m):
      return m.prefill(labels=labels, batch_size=batch_size,
                       encoded=encoded, drop_labels=drop_labels)

    _, vars0 = nn.apply(init_cache, model, mutable=True)(params)
    logits0, vars1 = nn.apply(prefill, model, mutable=True)(
        {**params, "cache": vars0["cache"]})
    return logits0, vars1["cache"]

  logits0, cache = make_cache(None)
  if cfg:
    drop = jnp.ones((batch_size,), bool)
    logits0_u, cache_u = make_cache(drop)
  else:
    logits0_u, cache_u = logits0, cache  # aliases; untouched when not cfg

  def step_logits(tok, cache, drop_labels=None):
    def run(m, tok):
      return m.decode(tok, encoded=encoded, decode=True,
                      drop_labels=drop_labels)
    logits, aux = nn.apply(run, model, mutable=True)(
        {**params, "cache": cache}, tok)
    return logits, aux["cache"]

  def get_pdf(logits):
    return model.get_pdf(logits, temperature_scales=temperature_scales,
                         temperature_probs=temperature_probs)

  def sample_token(logits, logits_u, rng):
    pdf = get_pdf(logits)
    if cfg:
      guided = distributions.make_cfg(pdf, get_pdf(logits_u), cfg_weight,
                                      rng)
      return guided.sample(jax.random.fold_in(rng, 1))
    tok = pdf.sample(seed=rng)
    if cfg_weight and labels is not None:
      # Fast path: loc-shift approximation of the guided density.
      tok = tok + cfg_weight * (tok - pdf.mean())
    return tok

  rngs = jax.random.split(seed, seq_len)

  def cond(state):
    i, *_ = state
    return i < seq_len

  def body(state):
    i, cache, cache_u, last_logits, last_logits_u, tokens = state
    tok = sample_token(last_logits[:, -1:], last_logits_u[:, -1:],
                       rngs[i])  # [B, 1, D]
    tokens = jax.lax.dynamic_update_slice(tokens, tok, (0, i, 0))

    def extend():
      logits, new_cache = step_logits(tok, cache)
      if cfg:
        drop = jnp.ones((batch_size,), bool)
        logits_u, new_cache_u = step_logits(tok, cache_u, drop)
      else:
        logits_u, new_cache_u = logits, new_cache
      return logits, logits_u, new_cache, new_cache_u

    new_logits, new_logits_u, cache, cache_u = jax.lax.cond(
        i + 1 < seq_len, extend,
        lambda: (last_logits, last_logits_u, cache, cache_u))
    return (i + 1, cache, cache_u, new_logits, new_logits_u, tokens)

  tokens0 = jnp.zeros((batch_size, seq_len, model.out_dim))
  state = (jnp.asarray(0), cache, cache_u, logits0, logits0_u, tokens0)
  *_, tokens = jax.lax.while_loop(cond, body, state)
  return tokens


def cache_map(fn, cache):
  frozen = isinstance(cache, flax.core.FrozenDict)
  if frozen:
    cache = flax.core.unfreeze(cache)
  flat = flax.traverse_util.flatten_dict(cache)
  flat = {k: fn(v) for k, v in flat.items()}
  out = flax.traverse_util.unflatten_dict(flat)
  return flax.core.freeze(out) if frozen else out
