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


@pytest.mark.parametrize("causal", [False, True])
def test_ring_seg_matches_masked_full(causal):
  """Prefix-LM segment masking is exact across ring shards."""
  mesh = jax.sharding.Mesh(np.array(jax.devices()), ("seq",))
  rs = np.random.RandomState(2)
  b, t, h, d = 2, 64, 2, 16
  q, k, v = (jnp.asarray(rs.randn(b, t, h, d), jnp.float32)
             for _ in range(3))
  # PaliGemma-style seg: prefix block shares id 1, suffix increments,
  # trailing padding is 0. Masks cross shard boundaries on the 8-way mesh.
  seg_np = np.zeros((b, t), np.int32)
  for i in range(b):
    pre, valid = 20 + 7 * i, t - 5 * (i + 1)
    seg_np[i, :pre] = 1
    seg_np[i, pre:valid] = np.arange(2, valid - pre + 2)
  seg = jnp.asarray(seg_np)

  ok = (seg[:, None, :] > 0) & (seg[:, None, :] <= seg[:, :, None])
  if causal:
    ok = ok & jnp.tril(jnp.ones((t, t), bool))[None]
  scale = d ** -0.5
  logits = jnp.einsum("bqhd,bkhd->bqhk", q, k) * scale
  logits = jnp.where(ok[:, :, None, :], logits, -jnp.inf)
  want = jnp.einsum("bqhk,bkhd->bqhd", jax.nn.softmax(logits, -1), v)

  got = ra.ring_attention_sharded(q, k, v, mesh, causal=causal, seg=seg)
  got, want = np.asarray(got), np.asarray(want)
  valid_q = np.asarray(seg) > 0  # padding rows are fully masked (NaN ref)
  np.testing.assert_allclose(got[valid_q], want[valid_q], atol=2e-5)
  assert np.all(np.isfinite(got))  # masked rows are 0, never NaN


def test_ring_bf16_accumulates_in_f32():
  """bf16 inputs: output matches the f32 dense reference to bf16 tol."""
  mesh = jax.sharding.Mesh(np.array(jax.devices()), ("seq",))
  rs = np.random.RandomState(3)
  q32, k32, v32 = (np.asarray(rs.randn(2, 64, 2, 16), np.float32)
                   for _ in range(3))
  want = np.asarray(full_attention(jnp.asarray(q32), jnp.asarray(k32),
                                   jnp.asarray(v32)))
  got = ra.ring_attention_sharded(
      jnp.asarray(q32, jnp.bfloat16), jnp.asarray(k32, jnp.bfloat16),
      jnp.asarray(v32, jnp.bfloat16), mesh)
  assert got.dtype == jnp.bfloat16
  np.testing.assert_allclose(np.asarray(got, np.float32), want, atol=2e-2)


def test_ring_auto_fallback_and_mesh():
  """ring_attention_auto: dense math without a seq mesh, ring with one."""
  rs = np.random.RandomState(4)
  q, k, v = (jnp.asarray(rs.randn(2, 64, 2, 16), jnp.float32)
             for _ in range(3))
  seg = jnp.asarray(
      np.where(np.arange(64)[None] < 50,
               np.arange(1, 65)[None].repeat(2, 0), 0), jnp.int32)
  ok = (seg[:, None, :] > 0) & (seg[:, None, :] <= seg[:, :, None])
  lg = jnp.einsum("bqhd,bkhd->bqhk", q, k) * 16**-0.5
  lg = jnp.where(ok[:, :, None, :], lg, -jnp.inf)
  want = np.asarray(
      jnp.einsum("bqhk,bkhd->bqhd", jax.nn.softmax(lg, -1), v))
  vq = np.asarray(seg) > 0

  got_local = ra.ring_attention_auto(q, k, v, seg=seg)  # no mesh
  np.testing.assert_allclose(np.asarray(got_local)[vq], want[vq],
                             atol=2e-5)
  mesh = jax.sharding.Mesh(np.array(jax.devices()), ("seq",))
  with jax.sharding.set_mesh(mesh):
    got_ring = ra.ring_attention_auto(q, k, v, seg=seg)
  np.testing.assert_allclose(np.asarray(got_ring)[vq], want[vq],
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


# ---------------------------------------------------------------------------
# Trainer integration: a config flag turns on context parallelism.
# ---------------------------------------------------------------------------

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _train(module, config, workdir):
  env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO,
         "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
  r = subprocess.run(
      [sys.executable, "-m", module, "--config", config,
       "--workdir", workdir],
      cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
  assert r.returncode == 0, (
      f"rc={r.returncode}\nSTDERR:\n{r.stderr[-2500:]}"
      f"\nSTDOUT:\n{r.stdout[-1000:]}")
  rows = [json.loads(l) for l in
          open(os.path.join(workdir, "big_vision_metrics.txt"))]
  return [r["training_loss"] for r in rows if "training_loss" in r]


@pytest.mark.slow
def test_trainer_ring_flag_matches_xla_vit(tmp_path):
  """smoke.py:attn=ring,seq_mesh=8 — 64 tokens sharded 8-way, exact."""
  cfg = ("big_vision_tpu/configs/smoke.py:"
         "total_steps=6,batch_size=16,mixup=False,seq_mesh=8,attn=")
  ring = _train("big_vision_tpu.train", cfg + "ring",
                str(tmp_path / "ring"))
  xla = _train("big_vision_tpu.train", cfg + "xla", str(tmp_path / "xla"))
  assert ring and xla
  np.testing.assert_allclose(ring, xla, rtol=1e-5)


@pytest.mark.slow
def test_trainer_ring_flag_matches_xla_prefix_lm(tmp_path):
  """PaliGemma prefix-LM with the LLM token axis sharded 8-way."""
  cfg = ("big_vision_tpu/configs/proj/paligemma/smoke.py:"
         "total_steps=6,batch_size=16,res=32,seq_mesh=8,attn=")
  ring = _train("big_vision_tpu.trainers.proj.paligemma.train",
                cfg + "ring", str(tmp_path / "ring"))
  xla = _train("big_vision_tpu.trainers.proj.paligemma.train",
               cfg + "xla", str(tmp_path / "xla"))
  assert ring and xla
  np.testing.assert_allclose(ring, xla, rtol=1e-5)
