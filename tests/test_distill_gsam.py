"""Distillation distances and GSAM gradient math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from big_vision_tpu.evaluators.proj.distill import cka as cka_mod
from big_vision_tpu.evaluators.proj.distill import distance as dd
from big_vision_tpu.trainers.proj.gsam import gsam


def _cka(x, y, n_batches=4):
  """Accumulate the minibatch-CKA estimator the way the evaluator does."""
  cross = s_norm = t_norm = 0.0
  for xb, yb in zip(np.split(x, n_batches), np.split(y, n_batches)):
    xb = jnp.asarray(xb - xb.mean(0, keepdims=True), jnp.float32)
    yb = jnp.asarray(yb - yb.mean(0, keepdims=True), jnp.float32)
    gx, gy = xb @ xb.T, yb @ yb.T
    cross += float(cka_mod.hsic1(gx, gy))
    s_norm += float(cka_mod.hsic1(gx, gx))
    t_norm += float(cka_mod.hsic1(gy, gy))
  return cross / (np.sqrt(s_norm) * np.sqrt(t_norm))


def test_cka_properties():
  rs = np.random.RandomState(0)
  x = rs.randn(64, 12).astype(np.float32)
  # Self-similarity is 1.
  np.testing.assert_allclose(_cka(x, x), 1.0, atol=1e-5)
  # Invariant to orthogonal transforms and isotropic scaling.
  q, _ = np.linalg.qr(rs.randn(12, 12))
  np.testing.assert_allclose(_cka(x, 3.7 * (x @ q.astype(np.float32))),
                             1.0, atol=1e-4)
  # Low similarity against independent features.
  y = rs.randn(64, 12).astype(np.float32)
  assert _cka(x, y) < 0.3


def test_cka_matches_full_batch_reference():
  """Minibatch accumulation with ONE batch equals textbook unbiased CKA."""
  rs = np.random.RandomState(1)
  x = rs.randn(32, 8).astype(np.float32)
  y = (x @ rs.randn(8, 6).astype(np.float32)
       + 0.1 * rs.randn(32, 6).astype(np.float32))
  got = _cka(x, y, n_batches=1)

  def hsic_np(k, l):
    n = k.shape[0]
    np.fill_diagonal(k, 0), np.fill_diagonal(l, 0)
    t1 = np.trace(k @ l)
    t2 = k.sum() * l.sum() / ((n - 1) * (n - 2))
    t3 = 2 / (n - 2) * (k.sum(0) @ l.sum(0))
    return (t1 + t2 - t3) / (n * (n - 3))

  xc, yc = x - x.mean(0), y - y.mean(0)
  kx, ky = xc @ xc.T, yc @ yc.T
  want = hsic_np(kx.copy(), ky.copy()) / np.sqrt(
      hsic_np(kx.copy(), kx.copy()) * hsic_np(ky.copy(), ky.copy()))
  np.testing.assert_allclose(got, want, rtol=1e-4)


def test_dist_kinds():
  rs = np.random.RandomState(0)
  s = jnp.asarray(rs.randn(4, 10), jnp.float32)
  t = jnp.asarray(rs.randn(4, 10), jnp.float32)
  assert np.all(np.asarray(dd.dist(s, s, "kl")) < 1e-5)
  assert np.all(np.asarray(dd.dist(s, s, "l2")) == 0)
  np.testing.assert_allclose(
      dd.dist(s, t, "l2"), np.sum((np.asarray(s - t)) ** 2, -1), rtol=1e-5)
  agree = dd.dist(s, s, "agree")
  assert np.all(np.asarray(agree) == 1)
  # Hard = CE against teacher argmax pseudo-labels.
  hard = np.asarray(dd.dist(s, t, "hard"))
  assert hard.shape == (4,) and np.all(hard >= 0)
  # KL with temperature is non-negative.
  assert np.all(np.asarray(dd.dist(s, t, "kl", t=2)) >= -1e-5)


def test_gsam_reduces_to_clean_grad():
  """rho=0, alpha=0: gsam gradient == plain gradient."""
  def loss_fn(p, x, y):
    return jnp.mean((x @ p - y) ** 2)
  rs = np.random.RandomState(0)
  p = jnp.asarray(rs.randn(3, 2), jnp.float32)
  x = jnp.asarray(rs.randn(8, 3), jnp.float32)
  y = jnp.asarray(rs.randn(8, 2), jnp.float32)
  l, g = gsam.gsam_gradient(loss_fn, p, x, y, rho_max=0.0, rho_min=0.0,
                            alpha=0.0, lr=0.1, lr_max=0.1, lr_min=0.1)
  l0, g0 = jax.value_and_grad(loss_fn)(p, x, y)
  np.testing.assert_allclose(l, l0, rtol=1e-6)
  np.testing.assert_allclose(g, g0, rtol=1e-5, atol=1e-6)


def test_gsam_sam_mode_perturbs():
  """rho>0, alpha=0 gives the SAM gradient (differs from clean)."""
  def loss_fn(p, x, y):
    return jnp.mean(jnp.sin(x @ p) - y) ** 2
  rs = np.random.RandomState(1)
  p = jnp.asarray(rs.randn(3, 2), jnp.float32)
  x = jnp.asarray(rs.randn(8, 3), jnp.float32)
  y = jnp.asarray(rs.randn(8, 2), jnp.float32)
  _, g_sam = gsam.gsam_gradient(loss_fn, p, x, y, rho_max=0.5, rho_min=0.5,
                                alpha=0.0, lr=0.1, lr_max=0.1, lr_min=0.1)
  _, g0 = jax.value_and_grad(loss_fn)(p, x, y)
  assert not np.allclose(np.asarray(g_sam), np.asarray(g0), atol=1e-6)


def test_gsam_rho_schedule():
  """rho interpolates linearly with lr between rho_min and rho_max."""
  captured = {}

  def loss_fn(p, x, y):
    return jnp.sum(p ** 2)

  p = jnp.ones((2,))
  # At lr=lr_max, rho=rho_max; at lr=lr_min, rho=rho_min. Verify via the
  # perturbation magnitude influencing the returned gradient.
  _, g_hi = gsam.gsam_gradient(loss_fn, p, None, None, rho_max=1.0,
                               rho_min=0.0, alpha=0.0, lr=1.0, lr_max=1.0,
                               lr_min=0.0)
  _, g_lo = gsam.gsam_gradient(loss_fn, p, None, None, rho_max=1.0,
                               rho_min=0.0, alpha=0.0, lr=0.0, lr_max=1.0,
                               lr_min=0.0)
  # lr=0 -> rho=0 -> grad of unperturbed params = 2*p = 2.
  np.testing.assert_allclose(g_lo, 2 * np.ones(2), rtol=1e-5)
  # lr=1 -> rho=1 -> params perturbed along grad direction -> larger grad.
  assert np.all(np.asarray(g_hi) > np.asarray(g_lo))
