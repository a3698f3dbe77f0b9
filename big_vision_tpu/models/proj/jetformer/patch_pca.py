"""Patch-PCA "tokenizer": pretrained PCA over image patches instead of a VAE.

Parity target: reference models/proj/jetformer/patch_pca.py. encode()
flattens an image into patch vectors and projects them with (whitened) PCA
components loaded from an npz; decode() inverts exactly. With
`skip_pca=True` the patches themselves are the latents (pure reshape) —
that mode needs no file and is what smoke configs use. The (orthogonal)
PCA and the reshape are volume-preserving up to the whitening scale, so
the Jet flow on top stays exactly invertible.

All reshapes are explicit reshape/transpose pairs (XLA lowers them to
layout changes that fuse with the adjacent PCA matmuls).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp

import big_vision_tpu.utils as u
from big_vision_tpu.models.proj.givt import vae


@functools.lru_cache(maxsize=None)
def _load_pca_params(pca_init_file):
  return u.npz_load(pca_init_file)


class Model(vae.Model):
  """Patch-PCA embedding model with a VAE-compatible interface."""

  pca_init_file: str = ""
  code_len: int = 256  # Informational (sequence length), like the ref.
  noise_std: float = 0.01
  add_dequant_noise: bool = False
  input_size: Sequence[int] = (256, 256)
  patch_size: Sequence[int] = (16, 16)
  whiten: bool = True
  depth_to_seq: int = 1
  skip_pca: bool = False

  def setup(self):
    assert self.codeword_dim is not None
    assert self.pca_init_file or self.skip_pca
    assert not self.skip_pca or self.depth_to_seq == 1
    if not self.skip_pca:
      table = _load_pca_params(self.pca_init_file)
      as_f32 = lambda key: jnp.asarray(table[key], jnp.float32)
      self.components_ = as_f32("components_")
      self.explained_variance_ = as_f32("explained_variance_")
      self.mean_ = as_f32("mean_")

  @property
  def _grid(self):
    (ih, iw), (p, q) = self.input_size, self.patch_size
    return ih // p, iw // q

  def _flatten_images(self, x):
    """[B, H, W, 3] -> [B, h*w, p*q*3] non-overlapping patch vectors."""
    b = x.shape[0]
    (h, w), (p, q) = self._grid, self.patch_size
    x = x.reshape(b, h, p, w, q, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * w, -1)

  def _unflatten_patches(self, x):
    """Exact inverse of _flatten_images (c=3)."""
    b = x.shape[0]
    (h, w), (p, q) = self._grid, self.patch_size
    x = x.reshape(b, h, w, p, q, 3).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * p, w * q, 3)

  def encode(self, x, *, train=False):
    del train
    if self.add_dequant_noise:
      x += jax.random.uniform(self.make_rng("dropout"), x.shape,
                              minval=0.0, maxval=1.0 / 127.5)
    x = self._flatten_images(x)
    if self.skip_pca:
      return x, jnp.zeros_like(x)

    # sklearn PCA transform: (x - mean) @ components.T, optionally whitened.
    # The mean is folded in post-matmul (distributivity), keeping encode a
    # single [B*S, D] @ [D, K] MXU matmul plus a rank-1 correction.
    mu = self.mean_.reshape(1, -1) @ self.components_.T
    z = x @ self.components_.T - mu
    if self.whiten:
      scale = jnp.sqrt(self.explained_variance_)
      eps = jnp.finfo(scale.dtype).eps
      z = z / jnp.maximum(scale, eps)

    if self.depth_to_seq > 1:
      b, s, fd = z.shape
      f = self.depth_to_seq
      z = z.reshape(b, s, f, fd // f).transpose(0, 2, 1, 3)
      z = z.reshape(b, f * s, fd // f)

    if self.noise_std > 0.0:
      logvar = jnp.full(z.shape, 2.0 * jnp.log(self.noise_std))
    else:
      logvar = jnp.zeros_like(z)
    return z, logvar

  def reparametrize(self, mu, logvar, rng=None):
    if self.noise_std <= 0.0:
      return mu
    return super().reparametrize(mu, logvar, rng)

  def decode(self, x, train=False):
    del train
    if not self.skip_pca:
      if self.depth_to_seq > 1:
        b, fs, d = x.shape
        f = self.depth_to_seq
        x = x.reshape(b, f, fs // f, d).transpose(0, 2, 1, 3)
        x = x.reshape(b, fs // f, f * d)
      # Inverse transform: un-whiten (fold the scale into the component
      # matrix — one matmul), then un-center.
      basis = self.components_
      if self.whiten:
        basis = jnp.sqrt(self.explained_variance_)[:, None] * basis
      x = x @ basis + self.mean_
    return jnp.clip(self._unflatten_patches(x), -1.0, 1.0)


def load(*args: Any) -> Any:
  """PCA params live in the module, not the params tree."""
  del args
  return {}
