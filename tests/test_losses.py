import jax
import jax.numpy as jnp
import numpy as np
import pytest

import big_vision_tpu.utils as u


def test_onehot():
  out = u.onehot(np.array([0, 2]), 3)
  np.testing.assert_array_equal(out, [[1, 0, 0], [0, 0, 1]])


def test_softmax_xent_matches_manual():
  logits = np.random.RandomState(0).randn(4, 10).astype(np.float32)
  labels = u.onehot(np.arange(4), 10)
  got = u.softmax_xent(logits=logits, labels=labels, reduction=False)
  want = -np.take_along_axis(
      np.asarray(jax.nn.log_softmax(logits)), np.arange(4)[:, None], 1)[:, 0]
  np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sigmoid_xent_stable():
  logits = np.array([[1000.0, -1000.0]])
  labels = np.array([[1.0, 0.0]])
  out = u.sigmoid_xent(logits=logits, labels=labels)
  assert np.isfinite(out) and float(out) < 1e-3


def test_weighted_softmax_xent_masking():
  rs = np.random.RandomState(1)
  logits = rs.randn(2, 5, 7).astype(np.float32)
  labels = rs.randint(0, 7, (2, 5))
  w = np.array([[1, 1, 0, 0, 0], [1, 1, 1, 1, 1]], np.float32)
  per_seq = u.weighted_softmax_xent(
      logits=logits, labels=labels, weights=w, reduction=False)
  # Sequence 0 loss must not depend on masked positions.
  logits2 = logits.copy()
  logits2[0, 2:] = 123.0
  per_seq2 = u.weighted_softmax_xent(
      logits=logits2, labels=labels, weights=w, reduction=False)
  np.testing.assert_allclose(per_seq[0], per_seq2[0], rtol=1e-6)


def test_bidirectional_contrastive_loss_perfect():
  z = np.eye(4, 8).astype(np.float32)
  loss, meta = u.bidirectional_contrastive_loss(z, z, t=100.0, reduction=True)
  assert float(loss) < 1e-3
  assert float(meta["ncorrect"]) == 1.0


def test_bidirectional_contrastive_loss_mask():
  z = np.eye(4, 8).astype(np.float32)
  mask = np.array([1, 1, 1, 0])
  loss, _ = u.bidirectional_contrastive_loss(
      z, z, t=10.0, mask=mask, reduction=True)
  assert np.isfinite(loss)


def test_accumulate_gradient_equivalence():
  def loss_fn(p, x, y):
    return jnp.mean((x @ p - y) ** 2)
  lg = jax.value_and_grad(loss_fn)
  rs = np.random.RandomState(0)
  p = jnp.asarray(rs.randn(3, 2), jnp.float32)
  x = jnp.asarray(rs.randn(8, 3), jnp.float32)
  y = jnp.asarray(rs.randn(8, 2), jnp.float32)
  l1, g1 = u.accumulate_gradient(lg, p, x, y, 1)
  l4, g4 = u.accumulate_gradient(lg, p, x, y, 4)
  np.testing.assert_allclose(l1, l4, rtol=1e-5)
  np.testing.assert_allclose(g1, g4, rtol=1e-4)


def test_mixup_convexity():
  rng = jax.random.PRNGKey(0)
  x = jnp.arange(8.0).reshape(4, 2)
  _, (mixed,), _ = u.mixup(rng, x, p=0.5)
  assert mixed.shape == x.shape
  lo = jnp.minimum(x, jnp.roll(x, 1, axis=0))
  hi = jnp.maximum(x, jnp.roll(x, 1, axis=0))
  assert bool(jnp.all(mixed >= lo - 1e-6) and jnp.all(mixed <= hi + 1e-6))
