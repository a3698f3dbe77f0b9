"""Ring attention: sequence-parallel attention over a mesh axis.

The reference has no sequence/context parallelism (SURVEY.md §2.2/§5); it
only annotates activations with the `act_len` logical axis. This module
supplies the TPU-native long-sequence path the survey calls for: shard the
sequence over a mesh axis, keep Q local, and rotate K/V blocks around the
ring with `lax.ppermute`, accumulating the exact softmax online
(flash-attention style running max/denominator). Peak memory per device is
O(T_local^2) instead of O(T^2), and the K/V rotation rides the ICI ring
concurrently with compute.

Use inside shard_map (see `ring_attention_sharded` for the wrapper):

  out = ring_attention(q, k, v, axis_name="seq")   # [B, T_loc, H, D]

Causal masking uses global positions derived from `jax.lax.axis_index`,
so prefix-LM/causal semantics match unsharded attention exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

try:
  from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
  from jax.experimental.shard_map import shard_map as _shard_map

P = jax.sharding.PartitionSpec


def _block_attn(q, k, v, bias):
  """Unnormalized block attention: returns (num, running_max, denom).

  q: [B, Tq, H, D], k/v: [B, Tk, H, D], bias: [Tq, Tk] or [B, Tq, Tk]
  additive (-inf for masked). Outputs: num [B, Tq, H, D], m/l [B, Tq, H].
  """
  scale = q.shape[-1] ** -0.5
  logits = jnp.einsum("bqhd,bkhd->bqhk", q, k,
                      preferred_element_type=jnp.float32) * scale
  if bias.ndim == 2:
    bias = bias[None]
  logits = logits + bias[:, :, None, :].astype(jnp.float32)
  m = jnp.max(logits, axis=-1)
  # Guard fully-masked rows (all -inf): exp(-inf - -inf) would be NaN.
  m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
  p = jnp.exp(logits - m_safe[..., None])
  p = jnp.where(jnp.isneginf(logits), 0.0, p)
  num = jnp.einsum("bqhk,bkhd->bqhd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32)
  l = jnp.sum(p, axis=-1)
  return num, m_safe, l


def ring_attention(q, k, v, *, axis_name, causal=False, seg=None):
  """Exact attention over a sequence sharded on `axis_name`.

  Args:
    q, k, v: [B, T_local, H, D] per-device blocks (inside shard_map).
    causal: apply causal masking with *global* positions.
    seg: optional [B, T_local] int32 local segment ids. Same semantics as
      `flash_attention`: position j is attendable from i iff
      0 < seg[j] <= seg[i] (padding=0, causal=arange+1, a bidirectional
      prefix shares one id). The K-side ids ride the ring with K/V, so
      prefix-LM masking is exact across shards. Combines (ANDs) with
      `causal` if both are given.
  Returns: [B, T_local, H, D] attention output for the local queries.
  """
  n = lax.axis_size(axis_name)
  my_idx = lax.axis_index(axis_name)
  t_loc = q.shape[1]
  perm = [(i, (i + 1) % n) for i in range(n)]  # send K/V to next device

  def bias_for(kv_idx, seg_k):
    if not causal and seg is None:
      return jnp.zeros((t_loc, t_loc), jnp.float32)
    ok = True
    if causal:
      q_pos = my_idx * t_loc + jnp.arange(t_loc)
      k_pos = kv_idx * t_loc + jnp.arange(t_loc)
      ok = q_pos[:, None] >= k_pos[None, :]          # [Tq, Tk]
    if seg is not None:
      seg_ok = (seg_k[:, None, :] > 0) & (seg_k[:, None, :] <= seg[:, :, None])
      ok = ok & seg_ok if causal else seg_ok         # [B, Tq, Tk]
    return jnp.where(ok, 0.0, -jnp.inf).astype(jnp.float32)

  def combine(acc, blk):
    o, m, l = acc
    o_b, m_b, l_b = blk
    new_m = jnp.maximum(m, m_b)
    s, s_b = jnp.exp(m - new_m), jnp.exp(m_b - new_m)
    return (o * s[..., None] + o_b * s_b[..., None],
            new_m, l * s + l_b * s_b)

  def body(i, carry):
    o, m, l, kk, vv, sk = carry
    kv_idx = (my_idx - i) % n  # whose K/V block we hold at step i
    blk = _block_attn(q, kk, vv, bias_for(kv_idx, sk))
    o, m, l = combine((o, m, l), blk)
    kk = lax.ppermute(kk, axis_name, perm)
    vv = lax.ppermute(vv, axis_name, perm)
    if seg is not None:
      sk = lax.ppermute(sk, axis_name, perm)
    return o, m, l, kk, vv, sk

  # Accumulate in float32 regardless of the input dtype (bf16 inputs keep
  # MXU matmuls fast; the softmax statistics and output sum must not lose
  # bits across ring steps). The loop carry becomes device-varying (it
  # depends on axis_index and on q's sharding, including any batch axes
  # the caller sliced over), so the initial values are DERIVED from q —
  # they inherit exactly q's varying axes, whatever the outer shard_map
  # sliced (explicit pcast over just the seq axis broke when the batch
  # was also sharded).
  o0 = jnp.zeros_like(q, jnp.float32)  # device-varying (derived from q)
  zq = jnp.sum(q.astype(jnp.float32) * 0.0, axis=-1)  # zeros, varies as q
  m0 = zq - jnp.inf
  l0 = zq
  # A dummy 1-element seg keeps the carry structure static when seg=None.
  s0 = seg if seg is not None else jnp.zeros((q.shape[0], 1), jnp.int32)
  o, _, l, _, _, _ = lax.fori_loop(0, n, body, (o0, m0, l0, k, v, s0))
  return (o / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)


def ring_attention_sharded(q, k, v, mesh, *, seq_axis="seq",
                           causal=False, seg=None):
  """Global-array entry point: shard T over `seq_axis` and run the ring.

  q, k, v: [B, T, H, D] global arrays; T must divide by the axis size.
  seg: optional [B, T] global segment ids (see `ring_attention`).
  """
  # Shard the batch over the mesh's non-seq axes too (greedy, divisibility
  # permitting): attention is independent per example, and leaving batch
  # unsharded in the shard_map specs would make jit all-gather it across
  # the data axis and compute the WHOLE batch redundantly on every
  # data-parallel group — D-fold wasted FLOPs and activation memory.
  rem = q.shape[0]
  batch_axes = []
  for a in mesh.axis_names:
    size = mesh.shape[a]
    if a == seq_axis or size == 1:
      continue
    if rem % size == 0:
      batch_axes.append(a)
      rem //= size
  b_spec = tuple(batch_axes) if batch_axes else None
  spec = P(b_spec, seq_axis, None, None)
  if seg is None:
    fn = _shard_map(
        functools.partial(ring_attention, axis_name=seq_axis,
                          causal=causal),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)
  seg_spec = P(b_spec, seq_axis)
  fn = _shard_map(
      lambda q, k, v, s: ring_attention(
          q, k, v, axis_name=seq_axis, causal=causal, seg=s),
      mesh=mesh, in_specs=(spec, spec, spec, seg_spec), out_specs=spec)
  return fn(q, k, v, seg)


def _resolve_mesh():
  from big_vision_tpu.utils.mesh import ambient_mesh
  return ambient_mesh()


def ring_attention_auto(q, k, v, *, causal=False, seg=None,
                        seq_axis="seq"):
  """Ring attention over the ambient mesh's `seq_axis`, if present.

  Model-friendly entry point: inside a jitted train step run under a
  mesh with a sequence axis, runs the exact context-parallel ring;
  without one (single host, tests, no seq sharding) it degrades to the
  same math on one device, so models can hardcode `attn_impl="ring"`
  regardless of the launch topology.
  """
  mesh = _resolve_mesh()
  has_seq = (mesh is not None and seq_axis in mesh.axis_names
             and mesh.shape[seq_axis] > 1)
  if has_seq and q.shape[1] % mesh.shape[seq_axis]:
    # A seq axis exists but can't be used: that's a misconfiguration
    # (e.g. token count not divisible by the axis), not a benign
    # single-device launch — losing context parallelism silently would
    # waste the whole mesh axis.
    raise ValueError(
        f"ring attention: T={q.shape[1]} not divisible by mesh axis "
        f"{seq_axis!r} of size {mesh.shape[seq_axis]}; pad the sequence "
        f"or resize the axis (falling back would silently drop context "
        f"parallelism)")
  if not has_seq:
    # Degenerate ring: the same blockwise math on a single device.
    bias = jnp.zeros((q.shape[1], q.shape[1]), jnp.float32)
    if causal:
      t = q.shape[1]
      bias = jnp.where(jnp.tril(jnp.ones((t, t), bool)), 0.0, -jnp.inf)
    if seg is not None:
      ok = (seg[:, None, :] > 0) & (seg[:, None, :] <= seg[:, :, None])
      bias = bias[None] + jnp.where(ok, 0.0, -jnp.inf)
    num, _, l = _block_attn(q, k, v, bias.astype(jnp.float32))
    return (num / jnp.maximum(l, 1e-30)[..., None]).astype(q.dtype)
  return ring_attention_sharded(q, k, v, mesh, seq_axis=seq_axis,
                                causal=causal, seg=seg)
