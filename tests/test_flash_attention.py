"""Flash attention vs reference einsum attention (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from big_vision_tpu.ops import attention, flash_attention

# Multi-minute on the 1-CPU CI host (jit compiles dominate): heavy tier.
pytestmark = pytest.mark.heavy



def rand_qkv(b=2, t=48, h=2, d=32, tkv=None, seed=0):
  rs = np.random.RandomState(seed)
  tkv = tkv or t
  q = jnp.asarray(rs.randn(b, t, h, d), jnp.float32)
  k = jnp.asarray(rs.randn(b, tkv, h, d), jnp.float32)
  v = jnp.asarray(rs.randn(b, tkv, h, d), jnp.float32)
  return q, k, v


def ref_attention(q, k, v, causal=False):
  mask = None
  if causal:
    tq, tkv = q.shape[1], k.shape[1]
    mask = jnp.tril(jnp.ones((tq, tkv), bool))[None, None]
  return attention._xla_attention(q, k, v, mask=mask)


@pytest.mark.parametrize("t", [16, 48, 196, 197])
def test_forward_matches_xla(t):
  q, k, v = rand_qkv(t=t)
  out = flash_attention.flash_attention(q, k, v, block_q=32, block_kv=32)
  want = ref_attention(q, k, v)
  np.testing.assert_allclose(out, want, atol=2e-5, rtol=1e-4)


def test_forward_causal():
  q, k, v = rand_qkv(t=64)
  out = flash_attention.flash_attention(q, k, v, causal=True,
                                        block_q=32, block_kv=32)
  want = ref_attention(q, k, v, causal=True)
  np.testing.assert_allclose(out, want, atol=2e-5, rtol=1e-4)


def test_cross_attention_shapes():
  q, k, v = rand_qkv(t=16, tkv=80)
  out = flash_attention.flash_attention(q, k, v, block_q=16, block_kv=32)
  want = ref_attention(q, k, v)
  np.testing.assert_allclose(out, want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_grads_match_xla(causal):
  q, k, v = rand_qkv(b=1, t=40, h=2, d=16)

  def loss_flash(q, k, v):
    o = flash_attention.flash_attention(q, k, v, causal=causal,
                                        block_q=16, block_kv=16)
    return jnp.sum(o * jnp.cos(o))

  def loss_ref(q, k, v):
    o = ref_attention(q, k, v, causal=causal)
    return jnp.sum(o * jnp.cos(o))

  g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
  g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
  for gf, gr, name in zip(g_flash, g_ref, "qkv"):
    np.testing.assert_allclose(gf, gr, atol=5e-5, rtol=1e-3,
                               err_msg=f"d{name} mismatch")


def test_bf16_forward_close():
  q, k, v = rand_qkv(t=64)
  qb, kb, vb = jax.tree.map(lambda x: x.astype(jnp.bfloat16), (q, k, v))
  out = flash_attention.flash_attention(qb, kb, vb, block_q=32, block_kv=32)
  want = ref_attention(q, k, v)
  np.testing.assert_allclose(np.asarray(out, np.float32), want,
                             atol=3e-2, rtol=3e-2)


def test_vit_uses_flash_when_impl_forced():
  """MHA module with attn_impl='flash' must agree with impl='xla'."""
  from big_vision_tpu.models import vit
  x = jnp.asarray(np.random.RandomState(0).randn(2, 50, 32), jnp.float32)
  mha_x = vit.MultiHeadAttention(num_heads=2, attn_impl="xla")
  mha_f = vit.MultiHeadAttention(num_heads=2, attn_impl="flash")
  p = mha_x.init(jax.random.PRNGKey(0), x, x)["params"]
  yx = mha_x.apply({"params": p}, x, x)
  yf = mha_f.apply({"params": p}, x, x)
  np.testing.assert_allclose(yf, yx, atol=2e-5, rtol=1e-4)


def test_oneshot_segment_mask_matches_reference():
  """Prefix-LM segment masking == reference bool-mask attention (+grads)."""
  import numpy as np
  from big_vision_tpu.ops import flash_attention as fa

  rs = np.random.RandomState(0)
  b, t, h, d = 2, 24, 2, 16
  q, k, v = (jnp.asarray(rs.randn(b, t, h, d), jnp.float32)
             for _ in range(3))
  # Per-example: bidirectional prefix of length p, then causal, then pad.
  prefix = np.array([5, 9])
  valid = np.array([20, 24])
  seg = np.zeros((b, t), np.int32)
  for i in range(b):
    seg[i, :prefix[i]] = 1
    seg[i, prefix[i]:valid[i]] = np.arange(2, valid[i] - prefix[i] + 2)
  seg = jnp.asarray(seg)

  def ref_attn(q, k, v):
    mask = (seg[:, None, :] > 0) & (seg[:, None, :] <= seg[:, :, None])
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d)
    s = jnp.where(mask[:, None], s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v)
    # Zero fully-masked (padding) query rows like the kernel does.
    return jnp.where((seg > 0)[:, :, None, None], out, 0.0)

  got = fa.flash_attention(q, k, v, seg=seg)
  want = ref_attn(q, k, v)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             atol=2e-5)

  g_got = jax.grad(lambda q, k, v: jnp.sum(
      fa.flash_attention(q, k, v, seg=seg) ** 2), argnums=(0, 1, 2))(
          q, k, v)
  g_want = jax.grad(lambda q, k, v: jnp.sum(ref_attn(q, k, v) ** 2),
                    argnums=(0, 1, 2))(q, k, v)
  for a, b_ in zip(g_got, g_want):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)


def test_oneshot_segment_causal_equivalence():
  """seg=arange+1 must equal causal=True."""
  import numpy as np
  from big_vision_tpu.ops import flash_attention as fa

  rs = np.random.RandomState(1)
  b, t, h, d = 2, 16, 2, 8
  q, k, v = (jnp.asarray(rs.randn(b, t, h, d), jnp.float32)
             for _ in range(3))
  seg = jnp.tile(jnp.arange(1, t + 1)[None], (b, 1))
  got = fa.flash_attention(q, k, v, seg=seg)
  want = fa.flash_attention(q, k, v, causal=True)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             atol=2e-5)


def test_flash_impl_never_drops_bool_mask():
  """impl='flash' with a bool mask must still mask (falls back to xla)."""
  import numpy as np
  from big_vision_tpu.ops import attention as attn_ops

  rs = np.random.RandomState(0)
  q, k, v = (jnp.asarray(rs.randn(1, 8, 2, 8), jnp.float32)
             for _ in range(3))
  mask = jnp.zeros((1, 1, 8, 8), bool).at[..., :4].set(True)
  got = attn_ops.dot_product_attention(q, k, v, mask=mask, impl="flash")
  want = attn_ops.dot_product_attention(q, k, v, mask=mask, impl="xla")
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             atol=1e-6)


def test_blocked_path_segment_mask_matches_reference():
  """seg masking on the blocked (long-T) kernels == reference (+grads)."""
  import numpy as np
  from big_vision_tpu.ops import flash_attention as fa

  rs = np.random.RandomState(2)
  b, t, h, d = 1, 48, 2, 16
  q, k, v = (jnp.asarray(rs.randn(b, t, h, d), jnp.float32)
             for _ in range(3))
  seg_np = np.zeros((b, t), np.int32)
  seg_np[0, :10] = 1                       # bidirectional prefix
  seg_np[0, 10:40] = np.arange(2, 32)      # causal tail
  seg = jnp.asarray(seg_np)                # 8 padding tokens

  def ref_attn(q, k, v):
    mask = (seg[:, None, :] > 0) & (seg[:, None, :] <= seg[:, :, None])
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d)
    s = jnp.where(mask[:, None], s, -1e30)
    w = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v)
    return jnp.where((seg > 0)[:, :, None, None], out, 0.0)

  # Force the blocked path with explicit small blocks.
  def flash(q, k, v):
    return fa.flash_attention(q, k, v, seg=seg, block_q=16, block_kv=16)

  got, want = flash(q, k, v), ref_attn(q, k, v)
  # Blocked path leaves padding-query rows unnormalized garbage-free but
  # not zeroed; compare only valid rows.
  valid = np.asarray(seg[0]) > 0
  np.testing.assert_allclose(np.asarray(got)[0, valid],
                             np.asarray(want)[0, valid], atol=2e-5)

  g_got = jax.grad(lambda q, k, v: jnp.sum(
      (flash(q, k, v) * (seg > 0)[:, :, None, None]) ** 2),
      argnums=(0, 1, 2))(q, k, v)
  g_want = jax.grad(lambda q, k, v: jnp.sum(ref_attn(q, k, v) ** 2),
                    argnums=(0, 1, 2))(q, k, v)
  for a, b_ in zip(g_got, g_want):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)


def test_oneshot_fits_boundaries():
  """Pin the VMEM routing gate measured on v5e (12MB bwd budget)."""
  from big_vision_tpu.ops import flash_attention as fa
  assert fa.oneshot_fits(197, 197, 64)     # ViT-B/16 224px
  assert fa.oneshot_fits(577, 577, 64)     # ViT 384px
  assert fa.oneshot_fits(896, 896, 64)
  assert fa.oneshot_fits(768, 768, 256)
  assert not fa.oneshot_fits(896, 896, 256)   # over budget -> xla/blocked
  assert not fa.oneshot_fits(1024, 1024, 64)  # blocked path from ~1k


def test_blocked_forward_zeros_fully_masked_rows():
  """Padding-query rows must be zero on BOTH kernel paths.

  The oneshot kernel zeros rows whose mask is all-False; the blocked
  forward must match (it used to emit mean(V): exp(NEG_INF-NEG_INF)=1),
  so crossing the oneshot_fits dispatch boundary never changes outputs.
  """
  from big_vision_tpu.ops import flash_attention as fa

  rs = np.random.RandomState(3)
  b, t, h, d = 1, 32, 2, 16
  q, k, v = (jnp.asarray(rs.randn(b, t, h, d), jnp.float32)
             for _ in range(3))
  seg_np = np.zeros((b, t), np.int32)
  seg_np[0, :20] = 1  # rows 20.. are padding (seg=0 -> fully masked)
  seg = jnp.asarray(seg_np)

  blocked = fa.flash_attention(q, k, v, seg=seg, block_q=16, block_kv=16)
  oneshot = fa.flash_attention(q, k, v, seg=seg)
  np.testing.assert_allclose(np.asarray(blocked)[0, 20:], 0.0, atol=1e-6)
  np.testing.assert_allclose(np.asarray(oneshot)[0, 20:], 0.0, atol=1e-6)
  np.testing.assert_allclose(np.asarray(blocked), np.asarray(oneshot),
                             atol=2e-5)


def test_seg_auto_dispatches_flash(monkeypatch):
  """impl='auto' with seg ids must route through the fused kernel when it
  fits (the VLM training shape), not the expanded-mask XLA path."""
  from big_vision_tpu.ops import attention as attn_ops
  from big_vision_tpu.ops import flash_attention as fa

  rs = np.random.RandomState(4)
  b, t, h, d = 1, 32, 2, 16
  q, k, v = (jnp.asarray(rs.randn(b, t, h, d), jnp.float32)
             for _ in range(3))
  seg = jnp.asarray(np.tile(np.arange(1, t + 1), (b, 1)), jnp.int32)

  calls = []
  real = fa.flash_attention
  monkeypatch.setattr(fa, "flash_attention",
                      lambda *a, **kw: calls.append(1) or real(*a, **kw))
  got = attn_ops.dot_product_attention(q, k, v, seg=seg, impl="auto")
  assert calls, "auto+seg did not dispatch the fused kernel"
  want = attn_ops.dot_product_attention(q, k, v, seg=seg, impl="xla")
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_blocked_bwd_matches_two_kernel():
  """The gated single-recompute blocked backward stays correct."""
  import big_vision_tpu.ops.flash_attention as fa
  rs = np.random.RandomState(0)
  bh, t, d = 2, 256, 32
  q, k, v = (jnp.asarray(rs.randn(bh, t, d), jnp.float32) * 0.3
             for _ in range(3))

  def grads():
    return jax.grad(
        lambda q, k, v: fa._attend(q, k, v, None, None, True, 128, 128)
        .sum(), argnums=(0, 1, 2))(q, k, v)

  old = fa.FUSED_BLOCKED_BWD
  try:
    fa.FUSED_BLOCKED_BWD = True
    assert fa.fused_bwd_fits(t, t, d, 128, 128)
    g_fused = grads()
    fa.FUSED_BLOCKED_BWD = False
    jax.clear_caches()
    g_two = grads()
  finally:
    fa.FUSED_BLOCKED_BWD = old
  for a, b in zip(g_fused, g_two):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-4)


def test_auto_policy_memory_aware():
  from big_vision_tpu.ops import attention
  # One-shot shapes -> kernel.
  assert attention._kernel_ok(197, 64, b=256, h=12)
  # Mid-T, small batch: XLA scores fit -> no kernel.
  assert not attention._kernel_ok(2048, 64, b=4, h=8)
  # Same T, big batch*heads: scores would blow HBM -> blocked kernel.
  assert attention._kernel_ok(2048, 64, b=256, h=16)
