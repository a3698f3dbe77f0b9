"""Fused flash attention for TPU (Pallas).

Online-softmax attention with O(T) memory: never materializes the [T, T]
score matrix in HBM. Forward + custom VJP, optional causal masking, and
transparent padding to MXU-friendly block sizes (ViT's T=196/197 work).

Layout: public API takes [B, T, H, D] (like ops/attention.py); kernels run
on [BH, T, D] with a grid over (batch*heads, query blocks). K/V for one
head live in VMEM whole (fine up to T ~ 4k at D=128); the kv loop is a
fori_loop over kv blocks with running max/sum accumulators in f32.

Softmax statistics are kept as LSE for the backward pass, which recomputes
P per block (standard flash backward; FLOPs for HBM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU backend; tests run interpret mode on CPU.
  from jax.experimental.pallas import tpu as pltpu
  _VMEM = pltpu.VMEM
except ImportError:  # pragma: no cover
  pltpu = None
  _VMEM = None

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_KV = 128
NEG_INF = -1e30
# Sequences up to this (padded) length take the one-shot path: whole rows
# per program, single softmax, fused dq/dk/dv backward with ONE recompute.
MAX_ONESHOT = 1024  # hard cap; `oneshot_fits` (VMEM) is the real gate
ONESHOT_BLOCK_B = 8
FUSED_BLOCKED_BWD = False  # see the measurement note in _bwd


def supports(t, d):
  """Shape gate used by ops.attention's auto dispatch."""
  return d <= 256 and t >= 16


def _r(x, m):
  return -(-x // m) * m


def _oneshot_bytes(tq, tkv, d, bwd):
  """VMEM bytes per problem at Mosaic's internal tile granularity.

  Kernels run unpadded; Mosaic rounds f32 mats to (8, 128) tiles and the
  bf16 in/out tensors to (16, 128) tiles internally.
  """
  nmats = 3 if bwd else 2
  mats = nmats * _r(tq, 8) * _r(tkv, 128) * 4
  io = (6 if bwd else 4) * (_r(tq, 16) + _r(tkv, 16)) * _r(d, 128) * 2
  return mats + io


def oneshot_fits(tq, tkv, d):
  """True if the one-shot kernel's backward working set fits VMEM.

  Mirrors `_oneshot_grid`'s budget at block_b=1: [Tq, Tkv] f32
  score/prob/dp mats plus bf16 in/out tensors must stay under ~12MB of
  the ~16MB scoped VMEM. Measured on v5e the one-shot fused backward
  beats XLA ~2x wherever it fits (T=577 D=64: 3.9 vs 7.4ms; T=768
  D=64: 4.8 vs 10.9ms; T=577 D=128: 4.3 vs 10.7ms grad time), and the
  unpadded layout is another ~25% faster at T=197 (5.6 vs 7.6ms/layer
  fwd+bwd).
  """
  per = _oneshot_bytes(tq, tkv, d, bwd=True)
  return max(tq, tkv) <= MAX_ONESHOT and per <= 12 * 1024 * 1024


def _interpret():
  return jax.default_backend() != "tpu"


def _bspec(block, idx):
  if _VMEM is None:
    return pl.BlockSpec(block, idx)
  return pl.BlockSpec(block, idx, memory_space=_VMEM)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, *refs, scale, block_kv,
                seq_q, seq_kv, causal, block_q, has_seg):
  if has_seg:
    seg_q_ref, seg_kv_ref, o_ref, lse_ref = refs
    seg_q = seg_q_ref[0, 0][:, None]  # [bq, 1]
  else:
    o_ref, lse_ref = refs
  qi = pl.program_id(1)
  q = q_ref[0].astype(jnp.float32) * scale  # [bq, d]
  bq, d = q.shape
  nkv = k_ref.shape[1] // block_kv

  row_ids = qi * block_q + jax.lax.broadcasted_iota(
      jnp.int32, (bq, block_kv), 0)

  def body(j, carry):
    m, l, acc = carry
    k = k_ref[0, pl.ds(j * block_kv, block_kv), :].astype(jnp.float32)
    v = v_ref[0, pl.ds(j * block_kv, block_kv), :].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [bq, bkv]
    col_ids = j * block_kv + jax.lax.broadcasted_iota(
        jnp.int32, (bq, block_kv), 1)
    mask = (col_ids < seq_kv) & (row_ids < seq_q)
    if causal:
      mask &= col_ids <= row_ids
    if has_seg:
      seg_kv = seg_kv_ref[0, 0, pl.ds(j * block_kv, block_kv)][None, :]
      mask &= (seg_kv > 0) & (seg_kv <= seg_q)
    s = jnp.where(mask, s, NEG_INF)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    # Explicitly zero masked entries: on a fully-masked row s-m_new is 0
    # (NEG_INF - NEG_INF), so exp alone would give p=1 and output mean(V)
    # instead of zeros — and the one-shot path zeros such rows, so the
    # dispatch boundary must not change padded-row outputs.
    p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
    alpha = jnp.exp(m - m_new)
    l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return m_new, l_new, acc_new

  m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
  l0 = jnp.zeros((bq, 1), jnp.float32)
  acc0 = jnp.zeros((bq, d), jnp.float32)
  m, l, acc = jax.lax.fori_loop(0, nkv, body, (m0, l0, acc0))

  l_safe = jnp.where(l == 0, 1.0, l)
  o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
  lse_ref[0, 0] = (m + jnp.log(l_safe))[:, 0]


def _fwd(q, k, v, seg_q=None, seg_kv=None, *, scale, causal, block_q,
         block_kv, seq_q, seq_kv):
  """q,k,v: [BH, Tq_pad, D], [BH, Tkv_pad, D]; returns (o, lse).

  seg_q/seg_kv: optional [BH, 1, T] segment ids (see _oneshot_softmax).
  """
  bh, tq, d = q.shape
  tkv = k.shape[1]
  grid = (bh, tq // block_q)
  has_seg = seg_q is not None
  kernel = functools.partial(
      _fwd_kernel, scale=scale, block_kv=block_kv, causal=causal,
      seq_q=seq_q, seq_kv=seq_kv, block_q=block_q, has_seg=has_seg)
  seg_specs = ([
      _bspec((1, 1, block_q), lambda b, i: (b, 0, i)),
      _bspec((1, 1, tkv), lambda b, i: (b, 0, 0)),
  ] if has_seg else [])
  args = (q, k, v) + ((seg_q, seg_kv) if has_seg else ())
  return pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=[
          _bspec((1, block_q, d), lambda b, i: (b, i, 0)),
          _bspec((1, tkv, d), lambda b, i: (b, 0, 0)),
          _bspec((1, tkv, d), lambda b, i: (b, 0, 0)),
          *seg_specs,
      ],
      out_specs=[
          _bspec((1, block_q, d), lambda b, i: (b, i, 0)),
          # LSE lives as [BH, 1, Tq]: TPU block tiling requires the last two
          # block dims divisible by (8, 128) or equal to the array dims.
          _bspec((1, 1, block_q), lambda b, i: (b, 0, i)),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
          jax.ShapeDtypeStruct((bh, 1, tq), jnp.float32),
      ],
      interpret=_interpret(),
  )(*args)


# ---------------------------------------------------------------------------
# One-shot short-sequence path.
#
# At ViT-scale T (~200-500) the blocked kernels lose to XLA: per-program
# work is tiny and the two-kernel backward recomputes the score matrix
# twice. Here each program owns `block_b` whole [T, T] attention problems:
# matmuls stay in bf16 on the MXU (f32 accumulation), softmax is computed
# once, and the backward produces dq, dk AND dv from a single recompute.
# Measured on TPU v5e at [3072, 256, 64]: fwd ties XLA (both are
# VPU-softmax-bound); the fused bwd is where the win is.
# ---------------------------------------------------------------------------


def _oneshot_softmax(q, k, *, scale, seq_q, seq_kv, causal,
                     seg_q=None, seg_kv=None):
  """[bb, T, T] masked probabilities p and row max/sum (f32).

  With segment ids (prefix-LM): position j is attendable from i iff
  0 < seg_kv[j] <= seg_q[i]. Padding carries seg=0. Causal attention is
  the special case seg = arange+1; block-bidirectional prefixes share one
  segment id (PaliGemma's mask_ar semantics, paligemma.py:27).

  The kernels run on UNPADDED [T, T] problems (Mosaic tiles ragged shapes
  internally, measured ~25% faster than explicit 128-padding at ViT's
  T=197), so the row/col bound masks exist only when the caller really
  padded; the pure-bidirectional case skips masking entirely.
  """
  s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                          preferred_element_type=jnp.float32) * scale
  mask = None
  if seq_q != q.shape[1] or seq_kv != k.shape[1]:
    rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    mask = (cols < seq_kv) & (rows < seq_q)
  if causal:
    rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    c = cols <= rows
    mask = c if mask is None else mask & c
  if seg_q is not None:
    sm = (seg_kv[:, None, :] > 0) & (seg_kv[:, None, :]
                                     <= seg_q[:, :, None])
    mask = sm if mask is None else mask & sm
  if mask is not None:
    s = jnp.where(mask, s, NEG_INF)
  m = jnp.max(s, axis=-1, keepdims=True)
  p = jnp.exp(s - m)
  if mask is not None:
    # Fully-masked rows (padding queries): output zeros, not NaN.
    p = jnp.where(mask, p, 0.0)
  l = jnp.sum(p, axis=-1, keepdims=True)
  return p, m, jnp.where(l == 0, 1.0, l)


def _oneshot_fwd_kernel(q_ref, k_ref, v_ref, *refs, scale, seq_q,
                        seq_kv, causal, has_seg):
  if has_seg:
    seg_q_ref, seg_kv_ref, o_ref = refs
    seg_q, seg_kv = seg_q_ref[:, 0, :], seg_kv_ref[:, 0, :]
  else:
    (o_ref,) = refs
    seg_q = seg_kv = None
  p, _, l = _oneshot_softmax(q_ref[...], k_ref[...], scale=scale,
                             seq_q=seq_q, seq_kv=seq_kv, causal=causal,
                             seg_q=seg_q, seg_kv=seg_kv)
  o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[...],
                          (((2,), (1,)), ((0,), (0,))),
                          preferred_element_type=jnp.float32)
  o_ref[...] = (o / l).astype(o_ref.dtype)


def _oneshot_bwd_kernel(q_ref, k_ref, v_ref, do_ref, *refs, scale,
                        seq_q, seq_kv, causal, has_seg):
  """Fused dq/dk/dv: ONE softmax recompute, five bf16 MXU matmuls."""
  if has_seg:
    seg_q_ref, seg_kv_ref, dq_ref, dk_ref, dv_ref = refs
    seg_q, seg_kv = seg_q_ref[:, 0, :], seg_kv_ref[:, 0, :]
  else:
    dq_ref, dk_ref, dv_ref = refs
    seg_q = seg_kv = None
  q, k, v = q_ref[...], k_ref[...], v_ref[...]
  do = do_ref[...]
  p, _, l = _oneshot_softmax(q, k, scale=scale, seq_q=seq_q,
                             seq_kv=seq_kv, causal=causal,
                             seg_q=seg_q, seg_kv=seg_kv)
  p = p / l  # normalized probabilities [bb, Tq, Tkv] f32
  pb = p.astype(v.dtype)
  dv = jax.lax.dot_general(pb, do, (((1,), (1,)), ((0,), (0,))),
                           preferred_element_type=jnp.float32)
  dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                           preferred_element_type=jnp.float32)
  delta = jnp.sum(p * dp, axis=-1, keepdims=True)
  ds = (p * (dp - delta)).astype(q.dtype)
  dq = jax.lax.dot_general(ds, k, (((2,), (1,)), ((0,), (0,))),
                           preferred_element_type=jnp.float32)
  dk = jax.lax.dot_general(ds, q, (((1,), (1,)), ((0,), (0,))),
                           preferred_element_type=jnp.float32)
  dq_ref[...] = (dq * scale).astype(dq_ref.dtype)
  dk_ref[...] = (dk * scale).astype(dk_ref.dtype)
  dv_ref[...] = dv.astype(dv_ref.dtype)


def _oneshot_grid(bh, tq, tkv, d, bwd=False):
  """Largest block_b whose working set fits scoped VMEM (~16MB)."""
  per = _oneshot_bytes(tq, tkv, d, bwd)
  bb = ONESHOT_BLOCK_B
  while bb > 1 and (bh % bb or bb * per > 12 * 1024 * 1024):
    bb //= 2
  return bb, (bh // bb,)


def _seg_specs(bb, tq, tkv, has_seg):
  # seg rides as [BH, 1, T] so any block_b satisfies TPU block tiling
  # (the last two block dims (1, T) match the array dims).
  if not has_seg:
    return []
  return [_bspec((bb, 1, tq), lambda b: (b, 0, 0)),
          _bspec((bb, 1, tkv), lambda b: (b, 0, 0))]


def _oneshot_fwd(q, k, v, seg_q, seg_kv, *, scale, causal, seq_q, seq_kv):
  bh, tq, d = q.shape
  tkv = k.shape[1]
  bb, grid = _oneshot_grid(bh, tq, tkv, d)
  has_seg = seg_q is not None
  kernel = functools.partial(_oneshot_fwd_kernel, scale=scale,
                             seq_q=seq_q, seq_kv=seq_kv, causal=causal,
                             has_seg=has_seg)
  args = (q, k, v) + ((seg_q, seg_kv) if has_seg else ())
  return pl.pallas_call(
      kernel, grid=grid,
      in_specs=[
          _bspec((bb, tq, d), lambda b: (b, 0, 0)),
          _bspec((bb, tkv, d), lambda b: (b, 0, 0)),
          _bspec((bb, tkv, d), lambda b: (b, 0, 0)),
          *_seg_specs(bb, tq, tkv, has_seg),
      ],
      out_specs=_bspec((bb, tq, d), lambda b: (b, 0, 0)),
      out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
      interpret=_interpret(),
  )(*args)


def _oneshot_bwd(q, k, v, do, seg_q, seg_kv, *, scale, causal, seq_q,
                 seq_kv):
  bh, tq, d = q.shape
  tkv = k.shape[1]
  bb, grid = _oneshot_grid(bh, tq, tkv, d, bwd=True)
  has_seg = seg_q is not None
  kernel = functools.partial(_oneshot_bwd_kernel, scale=scale,
                             seq_q=seq_q, seq_kv=seq_kv, causal=causal,
                             has_seg=has_seg)
  args = (q, k, v, do) + ((seg_q, seg_kv) if has_seg else ())
  return pl.pallas_call(
      kernel, grid=grid,
      in_specs=[
          _bspec((bb, tq, d), lambda b: (b, 0, 0)),
          _bspec((bb, tkv, d), lambda b: (b, 0, 0)),
          _bspec((bb, tkv, d), lambda b: (b, 0, 0)),
          _bspec((bb, tq, d), lambda b: (b, 0, 0)),
          *_seg_specs(bb, tq, tkv, has_seg),
      ],
      out_specs=[
          _bspec((bb, tq, d), lambda b: (b, 0, 0)),
          _bspec((bb, tkv, d), lambda b: (b, 0, 0)),
          _bspec((bb, tkv, d), lambda b: (b, 0, 0)),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
          jax.ShapeDtypeStruct((bh, tkv, d), k.dtype),
          jax.ShapeDtypeStruct((bh, tkv, d), v.dtype),
      ],
      interpret=_interpret(),
  )(*args)


def _pad_seg(seg, t_pad):
  """[BH, T] -> [BH, 1, T_pad] (the layout the kernels consume)."""
  if seg is None:
    return None
  if seg.shape[-1] != t_pad:
    seg = jnp.pad(seg, ((0, 0), (0, t_pad - seg.shape[-1])))
  return seg[:, None, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _attend_oneshot(q, k, v, seg_q, seg_kv, causal):
  return _attend_oneshot_fwd(q, k, v, seg_q, seg_kv, causal)[0]


def _attend_oneshot_fwd(q, k, v, seg_q, seg_kv, causal):
  # No explicit padding: Mosaic tiles ragged [T, T] problems internally
  # (8/16-row, 128-lane granularity), measured faster than padding to 128
  # at short T — and the bound masks vanish from the kernel entirely.
  seq_q, seq_kv = q.shape[1], k.shape[1]
  scale = 1.0 / np.sqrt(q.shape[-1])
  sq, sk = _pad_seg(seg_q, seq_q), _pad_seg(seg_kv, seq_kv)
  o = _oneshot_fwd(q, k, v, sq, sk, scale=scale, causal=causal,
                   seq_q=seq_q, seq_kv=seq_kv)
  # Residuals are just the inputs: bwd recomputes the softmax.
  return o, (q, k, v, sq, sk, seq_q, seq_kv, scale)


def _attend_oneshot_bwd(causal, res, g):
  q, k, v, sq, sk, seq_q, seq_kv, scale = res
  dq, dk, dv = _oneshot_bwd(q, k, v, g, sq, sk, scale=scale,
                            causal=causal, seq_q=seq_q, seq_kv=seq_kv)
  return (dq, dk, dv, None, None)


_attend_oneshot.defvjp(_attend_oneshot_fwd, _attend_oneshot_bwd)


# ---------------------------------------------------------------------------
# Backward
#
# Preferred path: ONE fused kernel (grid over kv blocks; dq is a revisited
# f32 accumulator output) producing dq+dk+dv from a single score recompute
# per (q-block x kv-block) pair. The two-kernel path below (dq kernel +
# dkv kernel, each recomputing scores) remains as the fallback for
# sequences whose full-q working set exceeds VMEM.
# ---------------------------------------------------------------------------


def _bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                      *refs, scale, block_q, seq_q, seq_kv, causal,
                      block_kv, has_seg):
  """Per program: one kv block vs ALL q blocks; one recompute total."""
  if has_seg:
    seg_q_ref, seg_kv_ref, dq_ref, dk_ref, dv_ref = refs
    seg_kv = seg_kv_ref[0, 0][None, :]  # [1, bkv]
  else:
    dq_ref, dk_ref, dv_ref = refs
  ki = pl.program_id(1)

  @pl.when(ki == 0)
  def _init():
    dq_ref[...] = jnp.zeros_like(dq_ref)

  k = k_ref[0].astype(jnp.float32)  # [bkv, d]
  v = v_ref[0].astype(jnp.float32)
  bkv, d = k.shape
  nq = q_ref.shape[1] // block_q
  col_ids = ki * block_kv + jax.lax.broadcasted_iota(
      jnp.int32, (block_q, bkv), 1)

  def body(i, carry):
    dk, dv = carry
    q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
    q = q * scale
    do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
    lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
    delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    row_ids = i * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, bkv), 0)
    mask = (col_ids < seq_kv) & (row_ids < seq_q)
    if causal:
      mask &= col_ids <= row_ids
    if has_seg:
      seg_q = seg_q_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
      mask &= (seg_kv > 0) & (seg_kv <= seg_q)
    p = jnp.where(mask, jnp.exp(s - lse), 0.0)
    dv_new = dv + jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dk_new = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    # dq contribution of this (q, kv) pair; f32 accumulator output so
    # summing across the kv grid dimension doesn't lose precision.
    dq_blk = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dq_ref[0, pl.ds(i * block_q, block_q), :] += dq_blk * scale
    return dk_new, dv_new

  dk0 = jnp.zeros((bkv, d), jnp.float32)
  dv0 = jnp.zeros((bkv, d), jnp.float32)
  dk, dv = jax.lax.fori_loop(0, nq, body, (dk0, dv0))
  dk_ref[0] = dk.astype(dk_ref.dtype)
  dv_ref[0] = dv.astype(dv_ref.dtype)


def fused_bwd_fits(tq, tkv, d, block_q, block_kv):
  """Full-q working set (q, do, lse, delta, f32 dq) must fit VMEM."""
  del tkv
  per = (2 * _r(tq, 16) * _r(d, 128) * 2     # q, do (bf16)
         + _r(tq, 8) * _r(d, 128) * 4        # dq accumulator (f32)
         + 2 * _r(tq, 128) * 4               # lse, delta
         + 2 * _r(block_kv, 16) * _r(d, 128) * 4
         + 3 * _r(block_q, 8) * _r(block_kv, 128) * 4)
  return per <= 10 * 1024 * 1024


def _bwd_fused(q, k, v, o, lse, do, seg_q, seg_kv, *, scale, causal,
               block_q, block_kv, seq_q, seq_kv):
  bh, tq, d = q.shape
  tkv = k.shape[1]
  has_seg = seg_q is not None
  delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                  axis=-1)[:, None, :]  # [BH, 1, Tq]
  seg_args = (seg_q, seg_kv) if has_seg else ()
  dq, dk, dv = pl.pallas_call(
      functools.partial(_bwd_fused_kernel, scale=scale, block_q=block_q,
                        seq_q=seq_q, seq_kv=seq_kv, causal=causal,
                        block_kv=block_kv, has_seg=has_seg),
      grid=(bh, tkv // block_kv),
      in_specs=[
          _bspec((1, tq, d), lambda b, j: (b, 0, 0)),
          _bspec((1, block_kv, d), lambda b, j: (b, j, 0)),
          _bspec((1, block_kv, d), lambda b, j: (b, j, 0)),
          _bspec((1, tq, d), lambda b, j: (b, 0, 0)),
          _bspec((1, 1, tq), lambda b, j: (b, 0, 0)),
          _bspec((1, 1, tq), lambda b, j: (b, 0, 0)),
          *([_bspec((1, 1, tq), lambda b, j: (b, 0, 0)),
             _bspec((1, 1, block_kv), lambda b, j: (b, 0, j))]
            if has_seg else []),
      ],
      out_specs=[
          # dq: one full block per bh, revisited (and accumulated) across
          # the sequential kv grid dimension.
          _bspec((1, tq, d), lambda b, j: (b, 0, 0)),
          _bspec((1, block_kv, d), lambda b, j: (b, j, 0)),
          _bspec((1, block_kv, d), lambda b, j: (b, j, 0)),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((bh, tq, d), jnp.float32),
          jax.ShapeDtypeStruct((bh, tkv, d), k.dtype),
          jax.ShapeDtypeStruct((bh, tkv, d), v.dtype),
      ],
      interpret=_interpret(),
  )(q, k, v, do, lse, delta, *seg_args)
  return dq.astype(q.dtype), dk, dv


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, *refs,
                   scale, block_kv, seq_q, seq_kv, causal, block_q,
                   has_seg):
  if has_seg:
    seg_q_ref, seg_kv_ref, dq_ref = refs
    seg_q = seg_q_ref[0, 0][:, None]
  else:
    (dq_ref,) = refs
  qi = pl.program_id(1)
  q = q_ref[0].astype(jnp.float32) * scale
  do = do_ref[0].astype(jnp.float32)
  lse = lse_ref[0, 0][:, None]
  delta = delta_ref[0, 0][:, None]
  bq, d = q.shape
  nkv = k_ref.shape[1] // block_kv
  row_ids = qi * block_q + jax.lax.broadcasted_iota(
      jnp.int32, (bq, block_kv), 0)

  def body(j, dq):
    k = k_ref[0, pl.ds(j * block_kv, block_kv), :].astype(jnp.float32)
    v = v_ref[0, pl.ds(j * block_kv, block_kv), :].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    col_ids = j * block_kv + jax.lax.broadcasted_iota(
        jnp.int32, (bq, block_kv), 1)
    mask = (col_ids < seq_kv) & (row_ids < seq_q)
    if causal:
      mask &= col_ids <= row_ids
    if has_seg:
      seg_kv = seg_kv_ref[0, 0, pl.ds(j * block_kv, block_kv)][None, :]
      mask &= (seg_kv > 0) & (seg_kv <= seg_q)
    p = jnp.where(mask, jnp.exp(s - lse), 0.0)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    return dq + jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)

  dq = jax.lax.fori_loop(0, nkv, body, jnp.zeros((bq, d), jnp.float32))
  dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    *refs, scale, block_q, seq_q, seq_kv, causal,
                    block_kv, has_seg):
  if has_seg:
    seg_q_ref, seg_kv_ref, dk_ref, dv_ref = refs
    seg_kv = seg_kv_ref[0, 0][None, :]  # [1, bkv]
  else:
    dk_ref, dv_ref = refs
  ki = pl.program_id(1)
  k = k_ref[0].astype(jnp.float32)  # [bkv, d]
  v = v_ref[0].astype(jnp.float32)
  bkv, d = k.shape
  nq = q_ref.shape[1] // block_q
  col_ids = ki * block_kv + jax.lax.broadcasted_iota(
      jnp.int32, (block_q, bkv), 1)

  def body(i, carry):
    dk, dv = carry
    q = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32) * scale
    do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
    lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
    delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    row_ids = i * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, bkv), 0)
    mask = (col_ids < seq_kv) & (row_ids < seq_q)
    if causal:
      mask &= col_ids <= row_ids
    if has_seg:
      seg_q = seg_q_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
      mask &= (seg_kv > 0) & (seg_kv <= seg_q)
    p = jnp.where(mask, jnp.exp(s - lse), 0.0)
    dv_new = dv + jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    dk_new = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    return dk_new, dv_new

  dk0 = jnp.zeros((bkv, d), jnp.float32)
  dv0 = jnp.zeros((bkv, d), jnp.float32)
  dk, dv = jax.lax.fori_loop(0, nq, body, (dk0, dv0))
  dk_ref[0] = dk.astype(dk_ref.dtype)
  dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd(q, k, v, o, lse, do, seg_q=None, seg_kv=None, *, scale, causal,
         block_q, block_kv, seq_q, seq_kv):
  bh, tq, d = q.shape
  tkv = k.shape[1]
  if FUSED_BLOCKED_BWD and fused_bwd_fits(tq, tkv, d, block_q, block_kv):
    # Measured on v5e the fused single-recompute kernel LOSES to the
    # two-kernel path (T=1056: 11.9 vs 10.3ms grad; T=4128: 33 vs 27ms):
    # the revisited f32 dq accumulator's read-modify-write per q-block
    # costs more than the second score recompute saves. Kept behind this
    # flag (and tested) in case the tradeoff flips on other hardware.
    return _bwd_fused(q, k, v, o, lse, do, seg_q, seg_kv, scale=scale,
                      causal=causal, block_q=block_q, block_kv=block_kv,
                      seq_q=seq_q, seq_kv=seq_kv)
  has_seg = seg_q is not None
  delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                  axis=-1)[:, None, :]  # [BH, 1, Tq]

  seg_args = (seg_q, seg_kv) if has_seg else ()
  dq = pl.pallas_call(
      functools.partial(_bwd_dq_kernel, scale=scale, block_kv=block_kv,
                        seq_q=seq_q, seq_kv=seq_kv,
                        causal=causal, block_q=block_q, has_seg=has_seg),
      grid=(bh, tq // block_q),
      in_specs=[
          _bspec((1, block_q, d), lambda b, i: (b, i, 0)),
          _bspec((1, tkv, d), lambda b, i: (b, 0, 0)),
          _bspec((1, tkv, d), lambda b, i: (b, 0, 0)),
          _bspec((1, block_q, d), lambda b, i: (b, i, 0)),
          _bspec((1, 1, block_q), lambda b, i: (b, 0, i)),
          _bspec((1, 1, block_q), lambda b, i: (b, 0, i)),
          *([_bspec((1, 1, block_q), lambda b, i: (b, 0, i)),
             _bspec((1, 1, tkv), lambda b, i: (b, 0, 0))]
            if has_seg else []),
      ],
      out_specs=_bspec((1, block_q, d), lambda b, i: (b, i, 0)),
      out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
      interpret=_interpret(),
  )(q, k, v, do, lse, delta, *seg_args)

  dk, dv = pl.pallas_call(
      functools.partial(_bwd_dkv_kernel, scale=scale, block_q=block_q,
                        seq_q=seq_q, seq_kv=seq_kv,
                        causal=causal, block_kv=block_kv,
                        has_seg=has_seg),
      grid=(bh, tkv // block_kv),
      in_specs=[
          _bspec((1, tq, d), lambda b, j: (b, 0, 0)),
          _bspec((1, block_kv, d), lambda b, j: (b, j, 0)),
          _bspec((1, block_kv, d), lambda b, j: (b, j, 0)),
          _bspec((1, tq, d), lambda b, j: (b, 0, 0)),
          _bspec((1, 1, tq), lambda b, j: (b, 0, 0)),
          _bspec((1, 1, tq), lambda b, j: (b, 0, 0)),
          *([_bspec((1, 1, tq), lambda b, j: (b, 0, 0)),
             _bspec((1, 1, block_kv), lambda b, j: (b, 0, j))]
            if has_seg else []),
      ],
      out_specs=[
          _bspec((1, block_kv, d), lambda b, j: (b, j, 0)),
          _bspec((1, block_kv, d), lambda b, j: (b, j, 0)),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((bh, tkv, d), k.dtype),
          jax.ShapeDtypeStruct((bh, tkv, d), v.dtype),
      ],
      interpret=_interpret(),
  )(q, k, v, do, lse, delta, *seg_args)
  return dq, dk, dv


# ---------------------------------------------------------------------------
# Public API with padding + custom VJP.
# ---------------------------------------------------------------------------


def _pad_to(x, t_pad):
  t = x.shape[1]
  if t == t_pad:
    return x
  return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _attend(q, k, v, seg_q, seg_kv, causal, block_q, block_kv):
  return _attend_fwd(q, k, v, seg_q, seg_kv, causal, block_q,
                     block_kv)[0]


def _attend_fwd(q, k, v, seg_q, seg_kv, causal, block_q, block_kv):
  seq_q, seq_kv = q.shape[1], k.shape[1]
  scale = 1.0 / np.sqrt(q.shape[-1])
  tq_pad = -(-seq_q // block_q) * block_q
  tkv_pad = -(-seq_kv // block_kv) * block_kv
  qp, kp, vp = _pad_to(q, tq_pad), _pad_to(k, tkv_pad), _pad_to(v, tkv_pad)
  sq, sk = _pad_seg(seg_q, tq_pad), _pad_seg(seg_kv, tkv_pad)
  o, lse = _fwd(qp, kp, vp, sq, sk, scale=scale, causal=causal,
                block_q=block_q, block_kv=block_kv, seq_q=seq_q,
                seq_kv=seq_kv)
  return o[:, :seq_q], (qp, kp, vp, sq, sk, o, lse, seq_q, seq_kv, scale)


def _attend_bwd(causal, block_q, block_kv, res, g):
  qp, kp, vp, sq, sk, o, lse, seq_q, seq_kv, scale = res
  dop = _pad_to(g, qp.shape[1])
  dq, dk, dv = _bwd(qp, kp, vp, o, lse, dop, sq, sk, scale=scale,
                    causal=causal, block_q=block_q, block_kv=block_kv,
                    seq_q=seq_q, seq_kv=seq_kv)
  return (dq[:, :seq_q], dk[:, :seq_kv], dv[:, :seq_kv], None, None)


_attend.defvjp(_attend_fwd, _attend_bwd)


def flash_attention(q, k, v, *, causal=False, seg=None, block_q=None,
                    block_kv=None):
  """Fused attention; q,k,v: [B, T, H, D] (Tq may differ from Tkv).

  `seg`: optional [B, T] int32 segment ids for prefix-LM masking —
  position j attendable from i iff 0 < seg[j] <= seg[i]; padding is
  seg=0; causal = arange+1; a bidirectional prefix shares one id.
  Supported on both the one-shot and the blocked (long-T) paths;
  requires Tq == Tkv.
  """
  b, tq, h, d = q.shape
  tkv = k.shape[1]

  def to_bh(x):
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, x.shape[1], d)

  seg_bh = None
  if seg is not None:
    assert tq == tkv and seg.shape == (b, tq), (seg.shape, q.shape)
    seg_bh = jnp.repeat(seg.astype(jnp.int32), h, axis=0)  # [BH, T]

  if (oneshot_fits(tq, tkv, d) and block_q is None
      and block_kv is None):
    o = _attend_oneshot(to_bh(q), to_bh(k), to_bh(v), seg_bh, seg_bh,
                        causal)
  else:
    block_q = block_q or min(DEFAULT_BLOCK_Q, max(16, tq))
    block_kv = block_kv or min(DEFAULT_BLOCK_KV, max(16, tkv))
    o = _attend(to_bh(q), to_bh(k), to_bh(v), seg_bh, seg_bh, causal,
                block_q, block_kv)
  return jnp.transpose(o.reshape(b, h, tq, d), (0, 2, 1, 3))
