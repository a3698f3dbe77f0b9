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
class Categorical:
  """logits: [..., V]; events are [...] int."""
  logits: jnp.ndarray

  @property
  def num_categories(self):
    return self.logits.shape[-1]

  def log_prob(self, x):
    logp = jax.nn.log_softmax(self.logits)
    x = jnp.asarray(x)
    valid = (x >= 0) & (x <= self.num_categories - 1)
    gathered = jnp.take_along_axis(
        logp, jnp.clip(x, 0, self.num_categories - 1)[..., None],
        axis=-1)[..., 0]
    return jnp.where(valid, gathered, -jnp.inf)

  def prob(self, x):
    return jnp.exp(self.log_prob(x))

  def sample(self, seed):
    return jax.random.categorical(seed, self.logits, axis=-1)

  def mean(self):
    raise NotImplementedError("Categorical has no mean.")


def select_component(pdf, rng=None, component=None):
  """Reduces a mixture to per-channel Normal params by component choice.

  Mirrors reference givt/parallel_decode.py:238
  (_assert_single_component_get_loc_scale): the mixture component is
  sampled once (from the *conditional* density) and the same selection is
  reused for the unconditional density, so guidance compares like against
  like. Returns (loc [..., D], scale [..., D], component) where
  `component` is the selection to replay on a second mixture (or None for
  single-component per-channel mixtures).
  """
  if isinstance(pdf, DiagMixture):
    if component is None:
      assert rng is not None
      comp = jax.random.categorical(rng, pdf.logits, axis=-1)
      component = jax.nn.one_hot(comp, pdf.logits.shape[-1], axis=-1)
    loc = (pdf.locs * component[..., None]).sum(-2)
    scale = (pdf.scales * component[..., None]).sum(-2)
    return loc, scale, component
  if isinstance(pdf, PerChannelMixture):
    if pdf.locs.shape[-1] == 1:  # single component: selection is trivial
      return pdf.locs[..., 0], pdf.scales[..., 0], None
    # Beyond the reference (which raises here): per-channel component
    # choice, replayed on the second mixture channel-by-channel.
    if component is None:
      assert rng is not None
      comp = jax.random.categorical(
          rng, jnp.log(pdf.probs + 1e-12), axis=-1)  # [..., D]
      component = jax.nn.one_hot(comp, pdf.probs.shape[-1], axis=-1)
    loc = (pdf.locs * component).sum(-1)
    scale = (pdf.scales * component).sum(-1)
    return loc, scale, component
  raise ValueError(f"CFG needs a mixture pdf, got {type(pdf)}")


def make_cfg(pdf_c, pdf_u, w, rng):
  """Builds the guided density p_c^(1+w)/p_u^w with shared components."""
  loc_c, scale_c, comp = select_component(pdf_c, rng)
  loc_u, scale_u, _ = select_component(pdf_u, rng, component=comp)
  return GaussianCFG(loc_c, scale_c, loc_u, scale_u, w)


@dataclasses.dataclass(frozen=True)
class GaussianCFG:
  """Classifier-free-guidance density p_c^(1+w) / p_u^w, per scalar channel.

  TPU-native port of reference givt/parallel_decode.py:264 (CFGDensity):
  the mixture component is sampled once from the *conditional* mixture,
  then each scalar channel's guided density is sampled by vectorized
  rejection sampling with a widened conditional-Normal envelope — a fixed
  `max_samples` batch of proposals, first accept wins (no while loop, so
  the whole sampler stays one fused XLA program). If nothing accepts
  (probability decays exponentially in max_samples), falls back to the
  conditional sample.

  loc_c/scale_c/loc_u/scale_u: [..., D] per-channel Normal params.
  """
  loc_c: jnp.ndarray
  scale_c: jnp.ndarray
  loc_u: jnp.ndarray
  scale_u: jnp.ndarray
  w: float

  def _unnorm_logp(self, x):
    logp_c = _normal_logp(x, self.loc_c, self.scale_c)
    logp_u = _normal_logp(x, self.loc_u, self.scale_u)
    return (1 + self.w) * logp_c - self.w * logp_u

  def log_prob(self, x):
    return self._unnorm_logp(x)  # Unnormalized, like the reference.

  def sample(self, seed, max_samples=128, envelope_grid=257):
    k_prop, k_uni, k_fb = jax.random.split(seed, 3)
    scale_env = jnp.maximum(self.scale_c, self.scale_u) * 2.0
    # Envelope factor: max over a grid of p(x)/q(x) around loc_c
    # (the reference scans a fixed [-10, 10] absolute grid; we scale by
    # the envelope width so narrow mixtures stay covered).
    grid = self.loc_c[None] + jnp.linspace(
        -10.0, 10.0, envelope_grid).reshape(
            (-1,) + (1,) * self.loc_c.ndim) * scale_env[None]
    log_fac = jnp.max(
        self._unnorm_logp(grid) - _normal_logp(grid, self.loc_c[None],
                                               scale_env[None]), axis=0)
    xs = self.loc_c[None] + scale_env[None] * jax.random.normal(
        k_prop, (max_samples,) + self.loc_c.shape)
    log_q = _normal_logp(xs, self.loc_c[None], scale_env[None])
    log_u = jnp.log(jax.random.uniform(
        k_uni, xs.shape, minval=1e-20, maxval=1.0))
    accept = (log_u + log_fac[None] + log_q) < self._unnorm_logp(xs)
    first = jnp.argmax(accept, axis=0)
    got_one = jnp.any(accept, axis=0)
    picked = jnp.take_along_axis(xs, first[None], axis=0)[0]
    fallback = self.loc_c + self.scale_c * jax.random.normal(
        k_fb, self.loc_c.shape)
    return jnp.where(got_one, picked, fallback)

  def mean(self):
    return self.loc_c + self.w * (self.loc_c - self.loc_u)


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


# ---------------------------------------------------------------------------
# Raw-head-output -> distribution builders, shared by givt.py / jetformer.py.
# ---------------------------------------------------------------------------


def square_plus(x):
  """Smooth positivity map (x + sqrt(x^2+4))/2, f(0)=1 (Barron, 2021)."""
  return (x + jnp.sqrt(jnp.square(x) + 4)) / 2


def square_plus_legacy(x):
  """GIVT's original mis-parenthesized variant (kept for ckpt parity)."""
  return x + jnp.sqrt(jnp.square(x) + 4) / 2


def mixture_from_raw(logits, *, num_mixtures, out_dim, scale_tol,
                     sp=square_plus, temp_scales=None, temp_probs=None):
  """DiagMixture from [..., M + 2*M*D] raw channels (mix | locs,scales)."""
  *lead, _ = logits.shape
  mix = logits[..., :num_mixtures]
  if temp_probs is not None:
    mix = mix * temp_probs
  rest = logits[..., num_mixtures:].reshape(*lead, num_mixtures, 2, out_dim)
  scales = jnp.maximum(sp(rest[..., 1, :]), scale_tol)
  if temp_scales is not None:
    scales = scales * temp_scales
  return DiagMixture(mix, rest[..., 0, :], scales)


def per_channel_from_raw(logits, *, num_mixtures, scale_tol, sp=square_plus,
                         temp_scales=None, temp_probs=None):
  """PerChannelMixture from [..., 3*M*D] raw channels ([probs;locs;scales])."""
  logits = logits.reshape(*logits.shape[:-1], 3, -1, num_mixtures)
  probs, locs, scales = (logits[..., i, :, :] for i in range(3))
  if temp_probs is not None:
    probs = probs * temp_probs
  scales = jnp.maximum(sp(scales), scale_tol)
  if temp_scales is not None:
    scales = scales * temp_scales
  return PerChannelMixture(jax.nn.softmax(probs), locs, scales)


def mvn_tri_from_raw(logits, *, out_dim, scale_tol, sp=square_plus,
                     temp_scales=None):
  """Lower-tri-covariance Normal from [..., D^2 + D] raw channels."""
  *lead, _ = logits.shape
  tri = sp(logits[..., :out_dim ** 2]).reshape(*lead, out_dim, out_dim)
  tri = jnp.maximum(tri, jnp.eye(out_dim) * scale_tol)
  if temp_scales is not None:
    tri = tri * temp_scales
  return MultivariateNormalTri(logits[..., out_dim ** 2:], tri)
