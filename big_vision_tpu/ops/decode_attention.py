"""Fused single-token decode attention over a stored KV cache (Pallas).

The autoregressive decode step's dominant HBM read is the KV cache
([B, K, S, H] per layer); at long context it rivals or exceeds the weight
bytes. XLA's einsum path reads the cache through a convert(+mask+softmax)
fusion which, measured on v5e, streams int8 cache *elements* at only ~70%
of the bf16 *byte* rate — there is no adjacent matmul to hide the
int8->bf16 convert under (docs/perf_notes.md, SERVING_r05 "xl_t").

This kernel instead DMAs the cache in its raw storage dtype (int8 or
bf16) into VMEM — the DMA engine streams 1 byte/element from HBM at full
rate — and dequantizes on-chip, where VMEM bandwidth is ~two orders of
magnitude above HBM. Per-slot scales (absmax over head_dim, the axis both
attention contractions consume — see models/ppp/gemma.py _quant_kv) are
folded into the f32 logits/probs exactly like the XLA path, so results
match the einsum path to bf16 tolerance.

Layout: one grid program per (batch, kv_head) pair owns the full [S, H]
cache plane (the contiguous storage layout _update_kv_cache writes) plus
the [G, H] grouped-query block, computes one masked softmax, and emits
[G, H]. Pallas double-buffers the next program's cache DMA behind the
current program's compute; per-program FLOPs (G<=8 query rows) are far
below the DMA time, so the kernel runs at the HBM streaming rate.

Scope: forward only (serving), q_len == 1 (the AR step). Prefill and
training use ops/flash_attention.py. Callers gate on `fits()` and fall
back to the XLA einsum path when the cache plane exceeds VMEM.

Reference decode contract: big_vision/models/ppp/gemma.py:161-195 (cache)
and :249-260 (grouped-query einsum attention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU backend; tests run interpret mode on CPU.
  from jax.experimental.pallas import tpu as pltpu
  _VMEM = pltpu.VMEM
except ImportError:  # pragma: no cover
  pltpu = None
  _VMEM = None

NEG_INF = -1e30
_GP = 8  # query rows per program: pad G up to one f32 sublane tile


def _r(x, m):
  return -(-x // m) * m


def fits(s, h, store_bytes):
  """True if one (batch, kv_head) cache plane fits the VMEM budget.

  Counts double-buffered k+v blocks (Pallas prefetches program i+1's DMA
  during program i), the bf16 operand copies the int8 path materializes,
  and the [GP, S] f32 score/prob mats, against ~12MB of the ~16MB scoped
  VMEM (the same margin ops/flash_attention.py budgets with).
  """
  s, h = _r(s, 128), _r(h, 128)
  blocks = 2 * 2 * s * h * store_bytes          # double-buffered k + v
  copies = 2 * s * h * 2 if store_bytes == 1 else 0  # int8 -> bf16
  mats = 3 * _GP * s * 4
  return blocks + copies + mats <= 12 * 1024 * 1024


def _interpret():
  return jax.default_backend() != "tpu"


def _bspec(block, idx):
  if _VMEM is None:
    return pl.BlockSpec(block, idx)
  return pl.BlockSpec(block, idx, memory_space=_VMEM)


def _kernel(q_ref, k_ref, v_ref, *refs, softcap, quant):
  if quant:
    ks_ref, vs_ref, m_ref, o_ref = refs
  else:
    m_ref, o_ref = refs
  # Operands in bf16 (int8 cache values are exact in bf16), f32 accumulate
  # + softmax — the same precision contract as the einsum path (which also
  # matmuls bf16 operands and folds the scales into f32 logits/probs).
  cd = jnp.bfloat16
  q = q_ref[0].astype(cd)                      # [GP, H]
  s = jax.lax.dot_general(q, k_ref[0].astype(cd), (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)  # [GP, S]
  if quant:
    s = s * ks_ref[0]                          # [1, S] f32 per-slot scales
  if softcap:
    s = softcap * jnp.tanh(s / softcap)
  valid = m_ref[0] > 0                         # [1, S]
  s = jnp.where(valid, s, NEG_INF)
  m = jnp.max(s, axis=-1, keepdims=True)
  # Zero masked entries explicitly: a fully-masked row would otherwise get
  # p = exp(NEG_INF - NEG_INF) = 1 per slot and emit mean(V), not zeros.
  p = jnp.where(valid, jnp.exp(s - m), 0.0)
  l = jnp.sum(p, axis=-1, keepdims=True)
  l = jnp.where(l == 0, 1.0, l)
  if quant:
    p = p * vs_ref[0]
  o = jax.lax.dot_general(p.astype(cd), v_ref[0].astype(cd),
                          (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)  # [GP, H]
  o_ref[0] = (o / l).astype(o_ref.dtype)


def decode_attention(q, k, v, mask, *, k_scale=None, v_scale=None,
                     logits_softcap=0.0):
  """One fused AR attention step over the stored cache.

  Args:
    q: [B, K, G, H] grouped single-token queries, already scaled (the
      caller applies its query_pre_attn_norm; no further 1/sqrt here).
    k, v: [B, K, S, H] cache in STORAGE dtype — int8 (quantized cache,
      pass the scales) or bf16/f32 (used as-is).
    mask: [B, S] bool, True on attendable slots.
    k_scale, v_scale: [B, K, S, 1] f32 per-slot dequant scales, or None.
    logits_softcap: optional gemma-2 style cap*tanh(logits/cap).

  Returns:
    [B, K, G, H] in q.dtype.
  """
  b, kh, g, h = q.shape
  s = k.shape[2]
  assert k.shape == v.shape == (b, kh, s, h), (q.shape, k.shape)
  assert mask.shape == (b, s), mask.shape
  quant = k_scale is not None
  bk = b * kh
  s_pad = _r(s, 128)

  def flat(x, pad_axis=None):
    x = x.reshape(bk, *x.shape[2:])
    if pad_axis is not None and s_pad != s:
      pads = [(0, 0)] * x.ndim
      pads[pad_axis] = (0, s_pad - s)
      x = jnp.pad(x, pads)
    return x

  qf = flat(q)                                  # [BK, G, H]
  if g < _GP:
    qf = jnp.pad(qf, ((0, 0), (0, _GP - g), (0, 0)))
  kf, vf = flat(k, pad_axis=1), flat(v, pad_axis=1)   # [BK, S_pad, H]
  # Mask/scale rows ride as [N, 1, S_pad] so each program's (1, 1, S_pad)
  # block has its last two dims equal to the array's — Mosaic requires
  # block dims be (8, 128)-divisible or full (a bare [N, S_pad] with a
  # 1-row block fails lowering when N isn't a multiple of 8).
  maskf = mask.astype(jnp.int32)               # [B, S_pad]
  if s_pad != s:
    maskf = jnp.pad(maskf, ((0, 0), (0, s_pad - s)))
  maskf = maskf[:, None, :]                    # [B, 1, S_pad]
  scale_args = ()
  scale_specs = []
  if quant:
    # [B, K, S, 1] -> [BK, 1, S_pad] f32, consumed as a [1, S] row block.
    scale_args = tuple(
        flat(x[..., 0], pad_axis=1)[:, None, :] for x in (k_scale, v_scale))
    scale_specs = [_bspec((1, 1, s_pad), lambda i: (i, 0, 0))] * 2

  kernel = functools.partial(_kernel, softcap=float(logits_softcap or 0.0),
                             quant=quant)
  out = pl.pallas_call(
      kernel,
      grid=(bk,),
      in_specs=[
          _bspec((1, _GP, h), lambda i: (i, 0, 0)),
          _bspec((1, s_pad, h), lambda i: (i, 0, 0)),
          _bspec((1, s_pad, h), lambda i: (i, 0, 0)),
          *scale_specs,
          _bspec((1, 1, s_pad), lambda i: (i // kh, 0, 0)),
      ],
      out_specs=_bspec((1, _GP, h), lambda i: (i, 0, 0)),
      out_shape=jax.ShapeDtypeStruct((bk, _GP, h), q.dtype),
      interpret=_interpret(),
  )(qf, kf, vf, *scale_args, maskf)
  return out[:, :g, :].reshape(b, kh, g, h)
