"""MaskGIT-style iterative parallel decoding for masked GIVT models.

Parity target: reference models/proj/givt/parallel_decode.py (DecodeState
:98, MaskedGenerationConfig :217). Starts fully masked; each of `steps`
rounds predicts GMMs for every position, samples, and reveals the
highest-likelihood fraction per the cosine schedule.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from big_vision_tpu.models.proj.givt import givt


@dataclasses.dataclass(frozen=True)
class MaskedGenerationConfig:
  steps: int = 8
  schedule: str = "cosine"
  temperature_scales: float | None = None
  temperature_probs: float | None = None
  choice_temperature: float = 1.0


def decode_masked(params, model, seed, *, batch_size, labels=None,
                  encoded=None, config=MaskedGenerationConfig()):
  """Returns sampled tokens [B, L, out_dim]."""
  seq_len = model.seq_len
  d = model.out_dim

  tokens = jnp.zeros((batch_size, seq_len, d))
  masked = jnp.ones((batch_size, seq_len), bool)

  def apply_model(tokens, masked, rng):
    logits = model.apply(
        {"params": params}, tokens, labels=labels,
        input_mask=masked, method=model.decode)
    pdf = model.get_pdf(logits,
                        temperature_scales=config.temperature_scales,
                        temperature_probs=config.temperature_probs)
    sample = pdf.sample(seed=rng)
    conf = pdf.log_prob(sample)
    if conf.ndim == 3:  # per-channel mixtures give per-dim logps
      conf = conf.sum(-1)
    return sample, conf

  rngs = jax.random.split(seed, config.steps)
  for step in range(config.steps):
    progress = (step + 1) / config.steps
    ratio = givt.apply_mask_schedule(progress, config.schedule)
    n_keep_masked = int(np.floor(float(ratio) * seq_len))

    sample, conf = apply_model(tokens, masked, rngs[step])
    # Already-revealed positions keep their tokens and get +inf confidence.
    conf = jnp.where(masked, conf, jnp.inf)
    if config.choice_temperature and step + 1 < config.steps:
      gumbel = -jnp.log(-jnp.log(jax.random.uniform(
          jax.random.fold_in(rngs[step], 1), conf.shape) + 1e-20) + 1e-20)
      conf = conf + config.choice_temperature * (1 - progress) * gumbel

    tokens = jnp.where(masked[..., None], sample, tokens)
    if n_keep_masked == 0 or step + 1 == config.steps:
      masked = jnp.zeros_like(masked)
    else:
      # Keep the n_keep_masked least-confident positions masked.
      thresh = jnp.sort(conf, axis=-1)[:, n_keep_masked - 1][:, None]
      masked = conf <= thresh
  return tokens
