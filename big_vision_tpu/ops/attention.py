"""Attention ops: one call-site, selectable implementation.

`dot_product_attention(q, k, v)` takes [B, T, H, D] tensors. Implementations:
  * "xla"   — einsum attention; XLA fuses well up to moderate T.
  * "flash" — Pallas fused flash-attention kernel (ops/flash_attention.py),
              O(T) memory, tiled for MXU/VMEM.
  * "ring"  — context-parallel ring attention (ops/ring_attention.py):
              sequence sharded over the ambient mesh's "seq" axis, K/V
              rotated via ppermute. Config-driven: set the model's
              attn_impl="ring" and give the trainer mesh a ("seq", N)
              axis; without one it degrades to single-device math.
  * "auto"  — flash when available & shapes suit the kernel, else xla.

Softmax always accumulates in float32 regardless of the matmul dtype —
bfloat16 logits lose too much for long rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _xla_attention(q, k, v, mask=None):
  """Plain einsum attention; q,k,v: [B, T, H, D] -> [B, T, H, D]."""
  depth = q.shape[-1]
  q = q * (1.0 / np.sqrt(depth)).astype(q.dtype)
  logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                      preferred_element_type=jnp.float32)
  if mask is not None:
    logits = jnp.where(mask, logits, -1e30)
  weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
  return jnp.einsum("bhqk,bkhd->bqhd", weights, v)


# XLA attention materializes [B, H, T, T] bf16 scores (transiently, under
# remat); beyond this many bytes the O(T)-memory blocked kernel is the
# only safe option even though XLA is somewhat faster on raw compute at
# mid-T (measured v5e, T=1056 BH=128: xla grad 6.1ms vs blocked 10.3ms).
XLA_SCORES_BYTES_LIMIT = 2 * 1024**3

# Mesh axes over which the batch is sharded (data/fsdp conventions used by
# sharding.py and the trainers). Axes like "model"/"seq" replicate the
# batch and must not shrink the per-device estimate.
_DATA_AXES = ("data", "fsdp", "replica", "batch")


def _batch_shard_factor():
  """How many ways the ambient mesh shards the batch dimension.

  Uses the data-like axes of the mesh entered by the trainer; with no
  mesh, falls back conservatively to jax.device_count() (pure-DP default,
  the common case for tests and single-config runs).
  """
  from big_vision_tpu.utils.mesh import ambient_mesh
  mesh = ambient_mesh()
  if mesh is None:
    return jax.device_count()
  f = 1
  for name in mesh.axis_names:
    if name in _DATA_AXES:
      f *= int(mesh.shape[name])
  return f


def _kernel_ok(t, d, b=1, h=1):
  """Shared auto-dispatch policy.

  One-shot fused kernel whenever its VMEM working set fits (strictly
  faster than XLA: 5.6 vs 9.7 ms/layer at ViT-B/16 shapes); otherwise the
  blocked kernel only when XLA's materialized score matrix would not fit
  comfortably in HBM; else XLA.
  """
  try:
    from big_vision_tpu.ops import flash_attention
  except ImportError:
    return False
  if not flash_attention.supports(t, d):
    return False
  # Memory estimate uses the PER-DEVICE batch: under jit the traced shape
  # is the global batch, but training shards it over the data axes (DP /
  # FSDP), so divide by the ambient mesh's data-like axis sizes — NOT
  # jax.device_count(), which over-divides on model/seq-parallel meshes
  # (replicated batch there) and under-estimates the per-device scores.
  # Dispatching on the global size would route sharded mid-T runs to the
  # blocked kernel even though per-device scores fit and XLA is faster.
  b_local = max(b // _batch_shard_factor(), 1)
  return (flash_attention.oneshot_fits(t, t, d)
          or b_local * h * t * t * 2 > XLA_SCORES_BYTES_LIMIT)


def _flash_available(q, mask):
  if mask is not None:
    return False  # masked variant arrives with the VLM family
  try:
    from big_vision_tpu.ops import flash_attention  # noqa: F401
  except ImportError:
    return False
  b, t, h, d = q.shape
  # Policy: the one-shot kernel beats XLA wherever its VMEM working set
  # fits (measured on v5e: 5.6 vs 9.7 ms/layer fwd+bwd at T=197 D=64;
  # T=577 grad 3.9 vs 7.4ms; docs/flash_parity.md has the accuracy side).
  # Past the one-shot limit XLA is faster on compute, so the blocked
  # kernel engages only when XLA's materialized scores would not fit.
  return _kernel_ok(t, d, b, h)


def dot_product_attention(q, k, v, mask=None, impl="auto", seg=None):
  """Multi-head attention core; shapes [B, T, H, D] (q may have Tq != Tkv).

  `mask` is broadcastable to [B, H, Tq, Tkv], True = attend. `seg` is an
  alternative [B, T] int32 encoding (0 = padding; j attendable from i iff
  0 < seg[j] <= seg[i]) that the fused flash kernel consumes directly;
  pass one or the other, not both.
  """
  if impl == "ring":
    if mask is not None:
      # Arbitrary boolean masks don't shard over the ring; keep the mask
      # semantics and let XLA handle it rather than silently dropping it.
      return _xla_attention(q, k, v, mask)
    from big_vision_tpu.ops import ring_attention
    return ring_attention.ring_attention_auto(q, k, v, seg=seg)
  if seg is not None:
    assert mask is None, "pass mask or seg, not both"
    if impl == "auto":
      # Same policy as the unmasked branch: the fused kernel consumes seg
      # ids natively, so segment-masked (VLM) attention should take it
      # whenever the one-shot working set fits or the blocked kernel's
      # O(T) memory wins — not silently fall back to a materialized
      # [B, H, Tq, Tkv] mask.
      b, t, h, d = q.shape
      if (t == k.shape[1] and _kernel_ok(t, d, b, h)):
        impl = "flash"
    if impl == "flash":
      from big_vision_tpu.ops import flash_attention
      return flash_attention.flash_attention(q, k, v, seg=seg)
    # xla path: expand seg to the boolean mask it encodes.
    mask = ((seg[:, None, None, :] > 0)
            & (seg[:, None, None, :] <= seg[:, None, :, None]))
    return _xla_attention(q, k, v, mask)
  if impl == "auto":
    impl = "flash" if _flash_available(q, mask) else "xla"
  if impl == "flash":
    if mask is not None:
      # Arbitrary boolean masks are not kernel-supported (use `seg` for
      # padding/prefix-LM structure); never silently drop a mask.
      return _xla_attention(q, k, v, mask)
    from big_vision_tpu.ops import flash_attention
    return flash_attention.flash_attention(q, k, v)
  assert impl == "xla", f"Unknown attention impl {impl!r}"
  return _xla_attention(q, k, v, mask)
