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

Beam/fan search (ref decode.py:170-380): with beam_size nb / fan_size nf,
every batch row keeps nb beams folded into the batch axis; each step draws
nf candidate continuations per beam, scores all nb*nf by accumulated
sequence log-density, and keeps the top nb (deterministic top-k, or
without-replacement sampling from softmax(score/temp) when
`rand_top_k=True`). `gt`/`keep_gt` pin chosen positions to ground-truth
tokens (here aligned so gt[:, i] pins position i; the reference applies
gt[:, i] to position i+1 and can never pin position 0).
"""

from __future__ import annotations

import flax
import jax
import jax.numpy as jnp
from flax import linen as nn

from big_vision_tpu.models.proj.givt import distributions


def _gather_cache(cache, idx, scanned=False):
  """Reorders the batch axis of every cache leaf by `idx` ([B] int32).

  Scanned decoders carry a leading layer axis on each leaf; map over it.
  """
  def g(x):
    return jnp.take(x, idx, axis=0) if x.ndim else x
  if scanned:
    return cache_map(lambda x: jax.lax.map(g, x) if x.ndim else x, cache)
  return cache_map(g, cache)


def generate(params, model, seed, *, batch_size=None, seq_len=None,
             labels=None, encoded=None, temperature_scales=None,
             temperature_probs=None, cfg_weight=0.0, cfg_fast_approx=False,
             beam_size=1, fan_size=1, rand_top_k=False, rand_top_k_temp=1.0,
             gt=None, keep_gt=None, return_logprobs=False):
  """Samples [B, L, out_dim] continuous token sequences.

  Returns the best beam per batch row; with `return_logprobs=True` also
  returns its accumulated log-density [B].
  """
  seq_len = seq_len or model.seq_len
  cfg = bool(cfg_weight) and labels is not None and not cfg_fast_approx
  if labels is not None:
    batch_size = labels.shape[0]
  assert batch_size, "Provide labels or batch_size."
  nb, nf = beam_size, fan_size
  beams = nb > 1 or nf > 1
  if cfg:
    assert not beams, "CFG + beam search not supported."
  track_lp = beams or return_logprobs
  bb = batch_size * nb  # beams folded into the batch axis
  if labels is not None and nb > 1:
    labels = jnp.repeat(labels, nb, axis=0)
  if encoded is not None and nb > 1:
    encoded = jnp.repeat(encoded, nb, axis=0)
  scanned = bool(getattr(model, "scan", False))

  def make_cache(drop_labels):
    def init_cache(m):
      dummy = jnp.zeros((bb, 1, model.out_dim))
      return m.decode(dummy, encoded=encoded, decode=True)

    def prefill(m):
      return m.prefill(labels=labels, batch_size=bb,
                       encoded=encoded, drop_labels=drop_labels)

    _, vars0 = nn.apply(init_cache, model, mutable=True)(params)
    logits0, vars1 = nn.apply(prefill, model, mutable=True)(
        {**params, "cache": vars0["cache"]})
    return logits0, vars1["cache"]

  logits0, cache = make_cache(None)
  if cfg:
    drop = jnp.ones((bb,), bool)
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

  def full_logprob(pdf, tok):
    lp = pdf.log_prob(tok)
    return lp[..., None] if lp.ndim < tok.ndim else lp

  def sample_token(logits, logits_u, rng):
    """Single-beam draw: token [B, 1, D] (+ per-dim logprob if tracked)."""
    pdf = get_pdf(logits)
    if cfg:
      guided = distributions.make_cfg(pdf, get_pdf(logits_u), cfg_weight,
                                      rng)
      tok = guided.sample(jax.random.fold_in(rng, 1))
      return tok, full_logprob(guided, tok) if track_lp else None
    tok = pdf.sample(seed=rng)
    if cfg_weight and labels is not None:
      # Fast path: loc-shift approximation of the guided density.
      tok = tok + cfg_weight * (tok - pdf.mean())
    return tok, full_logprob(pdf, tok) if track_lp else None

  def override_gt(tok, i):
    # tok: [..., D] candidates for position i.
    if gt is None:
      return tok
    pin = jnp.broadcast_to(gt[:, i][:, None], tok.shape) if tok.ndim == 3 \
        else gt[:, i]
    return jnp.where(keep_gt[i], pin, tok)

  rngs = jax.random.split(seed, seq_len)

  def cond(state):
    i, *_ = state
    return i < seq_len

  def advance(i, tok, cache, cache_u, last_logits, last_logits_u):
    """Extends both decode streams with `tok` unless at the last step."""
    def extend():
      logits, new_cache = step_logits(tok, cache)
      if cfg:
        drop = jnp.ones((bb,), bool)
        logits_u, new_cache_u = step_logits(tok, cache_u, drop)
      else:
        logits_u, new_cache_u = logits, new_cache
      return logits, logits_u, new_cache, new_cache_u

    return jax.lax.cond(
        i + 1 < seq_len, extend,
        lambda: (last_logits, last_logits_u, cache, cache_u))

  def body_single(state):
    i, cache, cache_u, last_logits, last_logits_u, tokens, cum_lp = state
    tok, lp = sample_token(last_logits[:, -1:], last_logits_u[:, -1:],
                           rngs[i])  # [B, 1, D]
    tok = override_gt(tok, i)
    tokens = jax.lax.dynamic_update_slice(tokens, tok, (0, i, 0))
    if track_lp:
      cum_lp = cum_lp + lp[:, 0]
    new_logits, new_logits_u, cache, cache_u = advance(
        i, tok, cache, cache_u, last_logits, last_logits_u)
    return (i + 1, cache, cache_u, new_logits, new_logits_u, tokens,
            cum_lp)

  def body_beams(state):
    i, cache, cache_u, last_logits, last_logits_u, tokens, cum_lp = state
    rng_i, rng_sel = jax.random.split(rngs[i])

    # nf candidate continuations per live beam: [B, nb*nf, ...].
    lg = last_logits[:, -1].reshape(batch_size, nb, -1)
    pdf = get_pdf(jnp.repeat(lg, nf, axis=1))
    cand = pdf.sample(seed=rng_i)                    # [B, nb*nf, D]
    cand = override_gt(cand, i)
    cand_lp = full_logprob(pdf, cand)                # [B, nb*nf, D]

    # Score = accumulated per-dim log-density summed over dims.
    cum = (jnp.repeat(cum_lp.reshape(batch_size, nb, -1), nf, axis=1)
           + cand_lp)                                # [B, nb*nf, D]
    score = cum.sum(-1)                              # [B, nb*nf]

    if rand_top_k:
      def stoc_top_k(r, p):
        return jax.random.choice(r, nb * nf, shape=(nb,), replace=False,
                                 p=p)
      sel = jax.vmap(stoc_top_k)(
          jax.random.split(rng_sel, batch_size),
          jax.nn.softmax(score / rand_top_k_temp, axis=-1))
    else:
      _, sel = jax.lax.top_k(score, k=nb)            # [B, nb]
    beam_sel = sel // nf                             # parent beams

    # Reorder the folded batch axis to the surviving beams.
    flat_beam = (jnp.arange(batch_size)[:, None] * nb
                 + beam_sel).reshape(-1)             # [bb]
    tokens = jnp.take(tokens, flat_beam, axis=0)
    cache = _gather_cache(cache, flat_beam, scanned)

    tok = jnp.take_along_axis(cand, sel[..., None], axis=1)  # [B, nb, D]
    tok = tok.reshape(bb, 1, -1)
    tokens = jax.lax.dynamic_update_slice(tokens, tok, (0, i, 0))
    cum_lp = jnp.take_along_axis(cum, sel[..., None], axis=1).reshape(
        bb, -1)

    new_logits, new_logits_u, cache, cache_u = advance(
        i, tok, cache, cache_u, last_logits, last_logits_u)
    return (i + 1, cache, cache_u, new_logits, new_logits_u, tokens,
            cum_lp)

  tokens0 = jnp.zeros((bb, seq_len, model.out_dim))
  cum_lp0 = jnp.zeros((bb, model.out_dim)) if track_lp else jnp.zeros(())
  state = (jnp.asarray(0), cache, cache_u, logits0, logits0_u, tokens0,
           cum_lp0)
  *_, tokens, cum_lp = jax.lax.while_loop(
      cond, body_beams if beams else body_single, state)

  # Best beam per batch row (top_k output is score-sorted; beam 0 wins).
  tokens = tokens.reshape(batch_size, nb, seq_len, -1)[:, 0]
  if return_logprobs:
    logprobs = cum_lp.reshape(batch_size, nb, -1)[:, 0].sum(-1)
    return tokens, logprobs
  return tokens


def cache_map(fn, cache):
  frozen = isinstance(cache, flax.core.FrozenDict)
  if frozen:
    cache = flax.core.unfreeze(cache)
  flat = flax.traverse_util.flatten_dict(cache)
  flat = {k: fn(v) for k, v in flat.items()}
  out = flax.traverse_util.unflatten_dict(flat)
  return flax.core.freeze(out) if frozen else out
