"""Ring attention equals full attention, bidirectional and causal."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from big_vision_tpu.ops import ring_attention as ra


def full_attention(q, k, v, causal=False):
  scale = q.shape[-1] ** -0.5
  logits = jnp.einsum("bqhd,bkhd->bqhk", q, k) * scale
  if causal:
    t = q.shape[1]
    mask = jnp.tril(jnp.ones((t, t), bool))
    logits = jnp.where(mask[None, :, None, :], logits, -jnp.inf)
  return jnp.einsum("bqhk,bkhd->bqhd",
                    jax.nn.softmax(logits, axis=-1), v)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_full(causal):
  mesh = jax.sharding.Mesh(np.array(jax.devices()), ("seq",))
  rs = np.random.RandomState(0)
  b, t, h, d = 2, 64, 4, 16  # t divides the 8-device mesh
  q, k, v = (jnp.asarray(rs.randn(b, t, h, d), jnp.float32)
             for _ in range(3))
  want = full_attention(q, k, v, causal=causal)
  got = ra.ring_attention_sharded(q, k, v, mesh, causal=causal)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             atol=2e-5)


def test_ring_is_jittable_and_grads_flow():
  mesh = jax.sharding.Mesh(np.array(jax.devices()), ("seq",))
  rs = np.random.RandomState(1)
  q, k, v = (jnp.asarray(rs.randn(1, 32, 2, 8), jnp.float32)
             for _ in range(3))

  @jax.jit
  def loss(q, k, v):
    return jnp.sum(ra.ring_attention_sharded(q, k, v, mesh) ** 2)

  g = jax.grad(loss)(q, k, v)
  assert np.all(np.isfinite(np.asarray(g)))
  # Grad matches full-attention grad.
  g_ref = jax.grad(
      lambda q, k, v: jnp.sum(full_attention(q, k, v) ** 2))(q, k, v)
  np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=3e-4)
