"""Gaussian VAE producing GIVT's continuous token sequences.

Parity target: reference models/proj/givt/vae.py (+ cnn.py backbone):
encode -> (mu, logvar) on a spatial grid, reparameterized sample flattened
to a token sequence [B, L, codeword_dim]; decode renders images back.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

import big_vision_tpu.utils as u
from big_vision_tpu.models import common


class Model(nn.Module):
  codeword_dim: int = 16
  # Declared sequence length of the latent code (ref vae.py:34). The
  # actual length is derived from the encoder output; this field exists
  # so configs (e.g. givt_imagenet2012) can carry it through Model(**cfg).
  code_len: int = 256
  filters: int = 64
  num_res_blocks: int = 2
  channel_multipliers: Sequence[int] = (1, 2, 4)
  out_channels: int = 3
  # Latent-token dropout during training ("none" | "seq" | "random"):
  # "seq" drops later tokens with higher probability; "random" permutes
  # that mask per example (ref models/proj/givt/vae.py:75-88).
  code_dropout: str = "none"

  def setup(self):
    # Deferred: cnn.Model subclasses this class, so a top-level import
    # of cnn here would be circular.
    from big_vision_tpu.models.proj.givt import cnn
    self.encoder = cnn.Encoder(
        filters=self.filters, num_res_blocks=self.num_res_blocks,
        channel_multipliers=tuple(self.channel_multipliers),
        out_dim=2 * self.codeword_dim)
    self.decoder = cnn.Decoder(
        filters=self.filters, num_res_blocks=self.num_res_blocks,
        channel_multipliers=tuple(self.channel_multipliers),
        out_channels=self.out_channels)

  def encode(self, image, train=False):
    """(mu, logvar), each [B, L, codeword_dim] (flattened spatial grid)."""
    del train
    stats = self.encoder(image)
    b, h, w, _ = stats.shape
    stats = stats.reshape(b, h * w, 2 * self.codeword_dim)
    mu, logvar = jnp.split(stats, 2, axis=-1)
    return mu, jnp.clip(logvar, -20, 10)

  def reparametrize(self, mu, logvar, rng=None):
    if rng is None:
      return mu
    std = jnp.exp(0.5 * logvar)
    return mu + std * jax.random.normal(rng, mu.shape)

  def decode(self, z, train=False):
    """Tokens [B, L, d] -> image."""
    del train
    b, l, d = z.shape
    hw = int(round(l ** 0.5))
    return self.decoder(z.reshape(b, hw, hw, d))

  def code_dropout_fn(self, z, *, train=False, rng=None):
    if self.code_dropout not in ("none", "seq", "random"):
      raise ValueError(f"Unknown code_dropout: {self.code_dropout!r}")
    if not train or self.code_dropout == "none":
      return z
    if rng is None:
      rng = self.make_rng("dropout")
    rng_thr, rng_perm = jax.random.split(rng)
    code_len = z.shape[1]
    importance = jnp.linspace(1.0, 0.0, code_len + 2)[1:-1]
    thr = jax.random.uniform(rng_thr, z.shape[:1])
    mask = importance[None, :] > thr[:, None]
    if self.code_dropout == "random":
      mask = jax.random.permutation(rng_perm, mask, axis=-1, independent=True)
    return z * mask[:, :, None]

  def __call__(self, image, *, train=False, rng=None):
    mu, logvar = self.encode(image, train=train)
    if train:
      if rng is None:
        rng = self.make_rng("dropout")
      rng_rep, rng_cd = jax.random.split(rng)
      z = self.reparametrize(mu, logvar, rng_rep)
      z = self.code_dropout_fn(z, train=True, rng=rng_cd)
    else:
      z = mu
    recon = self.decode(z, train=train)
    out = {"mu": mu, "logvar": logvar, "z": z, "recon": recon}
    return recon, out


def kl_divergence(mu, logvar):
  """KL(q(z|x) || N(0, 1)) per example."""
  return 0.5 * jnp.sum(jnp.exp(logvar) + mu ** 2 - 1 - logvar,
                       axis=range(1, mu.ndim))


def load(init_params, init_file, model_params=None, dont_load=()):
  del model_params
  ckpt = u.load_params(init_file)
  return common.merge_params(ckpt, init_params, dont_load)
