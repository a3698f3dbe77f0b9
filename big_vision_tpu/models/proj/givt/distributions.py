"""Minimal distribution toolkit for GIVT (distrax is not in this image).

Implements exactly the three families GIVT's get_pdf needs (reference
models/proj/givt/givt.py:600-690 uses distrax):

  * PerChannelMixture: independent 1-D GMM per output channel.
  * DiagMixture: mixture of diagonal multivariate Normals.
  * MultivariateNormalTri: lower-triangular-covariance Normal.

All expose .log_prob(x), .prob(x), .sample(seed=...), .mean().
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

_LOG2PI = float(np.log(2 * np.pi))


def _normal_logp(x, loc, scale):
  return -0.5 * (((x - loc) / scale) ** 2 + 2 * jnp.log(scale) + _LOG2PI)


@dataclasses.dataclass(frozen=True)
class PerChannelMixture:
  """probs/locs/scales: [..., D, M]; events are [..., D] (indep channels)."""
  probs: jnp.ndarray
  locs: jnp.ndarray
  scales: jnp.ndarray

  def log_prob(self, x):
    logp = _normal_logp(x[..., None], self.locs, self.scales)
    return jax.nn.logsumexp(jnp.log(self.probs + 1e-12) + logp, axis=-1)

  def prob(self, x):
    return jnp.exp(self.log_prob(x))

  def sample(self, seed):
    k1, k2 = jax.random.split(seed)
    comp = jax.random.categorical(
        k1, jnp.log(self.probs + 1e-12), axis=-1)  # [..., D]
    loc = jnp.take_along_axis(self.locs, comp[..., None], axis=-1)[..., 0]
    scale = jnp.take_along_axis(self.scales, comp[..., None],
                                axis=-1)[..., 0]
    return loc + scale * jax.random.normal(k2, loc.shape)

  def mean(self):
    return jnp.sum(self.probs * self.locs, axis=-1)


@dataclasses.dataclass(frozen=True)
class DiagMixture:
  """logits: [..., M]; locs/scales: [..., M, D]; events are [..., D]."""
  logits: jnp.ndarray
  locs: jnp.ndarray
  scales: jnp.ndarray

  def log_prob(self, x):
    logp = jnp.sum(_normal_logp(x[..., None, :], self.locs, self.scales),
                   axis=-1)  # [..., M]
    return jax.nn.logsumexp(jax.nn.log_softmax(self.logits) + logp,
                            axis=-1)

  def prob(self, x):
    return jnp.exp(self.log_prob(x))

  def sample(self, seed):
    k1, k2 = jax.random.split(seed)
    comp = jax.random.categorical(k1, self.logits, axis=-1)  # [...]
    loc = jnp.take_along_axis(
        self.locs, comp[..., None, None],
        axis=-2)[..., 0, :]
    scale = jnp.take_along_axis(
        self.scales, comp[..., None, None], axis=-2)[..., 0, :]
    return loc + scale * jax.random.normal(k2, loc.shape)

  def mean(self):
    w = jax.nn.softmax(self.logits)[..., None]
    return jnp.sum(w * self.locs, axis=-2)


@dataclasses.dataclass(frozen=True)
class MultivariateNormalTri:
  """locs: [..., D]; scale_tril: [..., D, D] (lower-triangular)."""
  locs: jnp.ndarray
  scale_tril: jnp.ndarray

  def log_prob(self, x):
    tril = jnp.tril(self.scale_tril)
    diff = x - self.locs
    # Solve L z = diff.
    z = jax.scipy.linalg.solve_triangular(tril, diff[..., None],
                                          lower=True)[..., 0]
    d = x.shape[-1]
    logdet = jnp.sum(jnp.log(jnp.abs(
        jnp.diagonal(tril, axis1=-2, axis2=-1))), axis=-1)
    return -0.5 * (jnp.sum(z ** 2, -1) + d * _LOG2PI) - logdet

  def prob(self, x):
    return jnp.exp(self.log_prob(x))

  def sample(self, seed):
    eps = jax.random.normal(seed, self.locs.shape)
    tril = jnp.tril(self.scale_tril)
    return self.locs + jnp.einsum("...ij,...j->...i", tril, eps)

  def mean(self):
    return self.locs
