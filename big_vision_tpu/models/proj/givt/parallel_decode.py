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

from big_vision_tpu.models.proj.givt import distributions
from big_vision_tpu.models.proj.givt import givt


@dataclasses.dataclass(frozen=True)
class MaskedGenerationConfig:
  steps: int = 8
  schedule: str = "cosine"
  temperature_scales: float | None = None
  temperature_probs: float | None = None
  choice_temperature: float = 1.0
  cfg_inference_weight: float = 0.0


def decode_masked(params, model, seed, *, batch_size, labels=None,
                  encoded=None, config=MaskedGenerationConfig()):
  """Returns sampled tokens [B, L, out_dim]."""
  seq_len = model.seq_len
  d = model.out_dim
  cfg_w = config.cfg_inference_weight
  cfg = bool(cfg_w) and labels is not None

  tokens = jnp.zeros((batch_size, seq_len, d))
  masked = jnp.ones((batch_size, seq_len), bool)

  def get_pdf(tokens, masked, drop_labels=None):
    logits = model.apply(
        {"params": params}, tokens, labels=labels,
        input_mask=masked, drop_labels=drop_labels, method=model.decode)
    return model.get_pdf(logits,
                         temperature_scales=config.temperature_scales,
                         temperature_probs=config.temperature_probs)

  def apply_model(tokens, masked, rng):
    pdf = get_pdf(tokens, masked)
    if cfg:
      # Exact density-based CFG (reference parallel_decode.py:450-481):
      # a second, unconditional forward pass; sample and rank by the
      # guided density p_c^(1+w)/p_u^w.
      pdf_u = get_pdf(tokens, masked,
                      drop_labels=jnp.ones((batch_size,), bool))
      pdf = distributions.make_cfg(pdf, pdf_u, cfg_w, rng)
      rng = jax.random.fold_in(rng, 1)
    sample = pdf.sample(seed=rng)
    conf = pdf.log_prob(sample)
    if conf.ndim == 3:  # per-channel/CFG give per-dim logps
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
