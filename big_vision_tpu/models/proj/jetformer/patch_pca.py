"""Patch-PCA "tokenizer": pretrained PCA over image patches instead of a VAE.

Parity target: reference models/proj/jetformer/patch_pca.py. encode()
flattens an image into patch vectors and projects them with (whitened) PCA
components loaded from an npz; decode() inverts exactly. With
`skip_pca=True` the patches themselves are the latents (pure reshape) —
that mode needs no file and is what smoke configs use. The (orthogonal)
PCA and the reshape are volume-preserving up to the whitening scale, so
the Jet flow on top stays exactly invertible.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import einops
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
    if self.skip_pca:
      return
    pca = _load_pca_params(self.pca_init_file)
    self.components_ = jnp.asarray(pca["components_"], jnp.float32)
    self.explained_variance_ = jnp.asarray(
        pca["explained_variance_"], jnp.float32)
    self.mean_ = jnp.asarray(pca["mean_"], jnp.float32)

  def _flatten_images(self, x):
    return einops.rearrange(
        x, "b (h p) (w q) c -> b (h w) (p q c)",
        p=self.patch_size[0], q=self.patch_size[1])

  def _unflatten_patches(self, x):
    (h, w), (p, q) = self.input_size, self.patch_size
    return einops.rearrange(
        x, "b (h w) (p q c) -> b (h p) (w q) c",
        h=h // p, w=w // q, p=p, q=q, c=3)

  def encode(self, x, *, train=False):
    del train
    if self.add_dequant_noise:
      x += jax.random.uniform(self.make_rng("dropout"), x.shape,
                              minval=0.0, maxval=1.0 / 127.5)
    x = self._flatten_images(x)
    if self.skip_pca:
      return x, jnp.zeros_like(x)

    # sklearn PCA transform: (x - mean) @ components.T, optionally whitened.
    x_emb = x @ self.components_.T
    x_emb -= jnp.reshape(self.mean_, (1, -1)) @ self.components_.T
    if self.whiten:
      scale = jnp.sqrt(self.explained_variance_)
      eps = jnp.finfo(scale.dtype).eps
      x_emb /= jnp.where(scale < eps, eps, scale)

    if self.depth_to_seq > 1:
      x_emb = einops.rearrange(
          x_emb, "b s (f d) -> b (f s) d", f=self.depth_to_seq)

    if self.noise_std <= 0.0:
      logvar = jnp.zeros_like(x_emb)
    else:
      logvar = 2.0 * jnp.log(jnp.full(x_emb.shape, self.noise_std))
    return x_emb, logvar

  def reparametrize(self, mu, logvar, rng=None):
    if self.noise_std <= 0.0:
      return mu
    return super().reparametrize(mu, logvar, rng)

  def decode(self, x, train=False):
    del train
    if not self.skip_pca:
      if self.depth_to_seq > 1:
        x = einops.rearrange(x, "b (f s) d -> b s (f d)",
                             f=self.depth_to_seq)
      if self.whiten:
        x = x @ (jnp.sqrt(self.explained_variance_[:, None])
                 * self.components_) + self.mean_
      else:
        x = x @ self.components_ + self.mean_
    return jnp.clip(self._unflatten_patches(x), -1.0, 1.0)


def load(*args: Any) -> Any:
  """PCA params live in the module, not the params tree."""
  del args
  return {}
