"""Jet flow: invertibility and log-det consistency."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from big_vision_tpu.models.proj.jet import jet
from big_vision_tpu.trainers.proj.jet.train import nll_bits_per_dim

# Multi-minute on the 1-CPU CI host (jit compiles dominate): heavy tier.
pytestmark = pytest.mark.heavy



def make_flow():
  model = jet.Model(depth=4, block_depth=1, emb_dim=16, num_heads=2, ps=4)
  x = jnp.zeros((2, 16, 16, 3))
  params = model.init(jax.random.PRNGKey(0), x)["params"]
  return model, params


def test_forward_inverse_roundtrip():
  model, params = make_flow()
  x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3), jnp.float32)
  z, logdet = model.apply({"params": params}, x, method=model.forward)
  x_back, logdet_inv = model.apply({"params": params}, z,
                                   method=model.inverse)
  np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-4)
  # Inverse log-det is the negation of forward's.
  np.testing.assert_allclose(np.asarray(logdet), -np.asarray(logdet_inv),
                             rtol=1e-4)


def test_logdet_matches_jacobian():
  """On a tiny flow, the analytic logdet equals the brute-force Jacobian."""
  model = jet.Model(depth=2, block_depth=1, emb_dim=8, num_heads=2, ps=2,
                    kinds=("channels", "spatial"))
  x0 = jnp.zeros((1, 4, 4, 1))
  params = model.init(jax.random.PRNGKey(1), x0)["params"]

  def flat_forward(xf):
    z, _ = model.apply({"params": params}, xf.reshape(1, 4, 4, 1),
                       method=model.forward)
    return z.reshape(-1)

  x = jnp.asarray(np.random.RandomState(0).rand(16), jnp.float32)
  jac = jax.jacfwd(flat_forward)(x)
  _, logdet = model.apply({"params": params}, x.reshape(1, 4, 4, 1),
                          method=model.forward)
  sign, brute = np.linalg.slogdet(np.asarray(jac))
  assert sign > 0
  np.testing.assert_allclose(float(logdet[0]), brute, rtol=1e-3)


def test_bits_per_dim_gaussian_reference():
  """For z ~ N(0,1) with logdet=0, bpd = entropy-rate/ln2 + 8."""
  rs = np.random.RandomState(0)
  z = jnp.asarray(rs.randn(4, 8, 8, 3), jnp.float32)
  bpd, nll, logdet = nll_bits_per_dim(z, jnp.zeros(4))
  want = 0.5 * (1 + np.log(2 * np.pi)) / np.log(2) + 8.0
  assert abs(float(jnp.mean(bpd)) - want) < 0.1
  np.testing.assert_allclose(np.asarray(logdet), 0.0)
  np.testing.assert_allclose(np.asarray(nll), np.asarray(bpd))
  # The reference's value_range(-1, 1) convention: bin = 2/255, i.e. the
  # discretization constant becomes log2(127.5) (ref train.py:275).
  bpd2, *_ = nll_bits_per_dim(z, jnp.zeros(4), bin_width=2.0 / 255.0)
  shift = 8.0 - np.log2(127.5)
  np.testing.assert_allclose(np.asarray(bpd2), np.asarray(bpd) - shift,
                             rtol=1e-6)
