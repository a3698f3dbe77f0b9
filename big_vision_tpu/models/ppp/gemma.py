"""Gemma / Gemma-2 language model.

Parity target: reference big_vision/models/ppp/gemma.py (variants
gemma_2b/7b, gemma2_2b/9b/27b; RoPE :148; dynamic-slice KV cache :161;
MHA/MQA/GQA via grouped heads :249; logit softcaps :313; gated-GeLU FFW
:336; scan-over-layers + remat :519; embed_only / pre_logits modes; orbax
checkpoint import :586). Param tree names match the reference/DeepMind
layout so public checkpoints load unmodified.

TPU-first notes: attention logits in f32 with grouped-query einsums that
keep the G (queries-per-kv-head) axis packed for the MXU; `embed_dtype`
selects bf16 activations; scan + remat bound compile time and memory.
"""

from __future__ import annotations

from typing import Optional

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import ml_collections
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.models import common


def get_config(variant):
  """Hyperparameter table for the released Gemma variants."""
  base = dict(variant=variant, norm_eps=1e-6, vocab_size=256_000,
              scan=True, remat_policy="nothing_saveable")
  v2 = dict(final_logits_softcap=30.0, attn_logits_softcap=50.0,
            post_norms=True)
  table = {
      "gemma_2b": dict(width=2048, depth=18, mlp_dim=16_384, num_heads=8,
                       num_kv_heads=1, head_dim=256),
      "gemma_7b": dict(width=3072, depth=28, mlp_dim=24_576, num_heads=16,
                       num_kv_heads=16, head_dim=256),
      "gemma2_2b": dict(width=2304, depth=26, mlp_dim=9_216, num_heads=8,
                        num_kv_heads=4, head_dim=256, **v2),
      "gemma2_9b": dict(width=3584, depth=42, mlp_dim=14_336, num_heads=16,
                        num_kv_heads=8, head_dim=256, **v2),
      "gemma2_27b": dict(width=4608, depth=46, mlp_dim=36_864, num_heads=32,
                         num_kv_heads=16, head_dim=128,
                         query_pre_attn_norm="rsqrt_emb_per_head", **v2),
      # Tiny test variant (ours): fast unit tests and smoke runs.
      "gemma_test": dict(width=32, depth=2, mlp_dim=64, num_heads=2,
                         num_kv_heads=1, head_dim=16, vocab_size=256),
  }
  if variant not in table:
    raise ValueError(f"Unknown gemma variant {variant!r}")
  return ml_collections.ConfigDict({**base, **table[variant]})


def _apply_rope(x, *, positions, max_wavelength=10_000):
  """Rotary position embedding; x [B, L, H, D], positions [B, L]."""
  d = x.shape[-1]
  # One rotation angle per (position, feature-pair): pair i spins at
  # wavelength^(2i/d), broadcast over heads -> [B, L, 1, d/2].
  inv_freq = max_wavelength ** (-2.0 * jnp.arange(d // 2) / d)
  angle = positions[:, :, None, None] * inv_freq
  cos, sin = jnp.cos(angle), jnp.sin(angle)
  lo, hi = jnp.split(x, 2, axis=-1)
  return jnp.concatenate([lo * cos - hi * sin, hi * cos + lo * sin], -1)


def _quant_kv(x):
  """Symmetric int8 per-(batch, slot, head) quantization over head_dim."""
  absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
  scale = jnp.maximum(absmax, 1e-30) / 127.0
  q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
               -127, 127).astype(jnp.int8)
  return q, scale


def _update_kv_cache(module, k, v, cache_size, cache_dtype):
  """Ring-less KV cache: prefill pads to cache_size; extend writes slot idx.

  The write index is shared across examples (the right-alignment trick in
  gemma_bv.py makes that valid) which keeps the update a plain
  dynamic_update_slice - no per-example scatter.

  Storage layout is [batch, kv_head, slot, head_dim] — NOT the [B, T, K, H]
  layout the projections produce. The AR step's dominant HBM read is the
  full cache, and its consumers (QK^T / PV) contract over head_dim with
  (batch, kv_head) as batch dims, so slot-major-per-head storage makes
  that read a contiguous [S, H] plane per (b, k) instead of K-strided
  rows; the tiny per-token update pays the transpose instead.

  cache_dtype="int8" stores K/V as int8 with per-(batch, head, slot) f32
  scales (absmax over head_dim, the only axis the attention contractions
  consume, so dequantization commutes with both the QK^T and the PV
  matmul). The scales are returned separately and folded into the
  logits/probs by the consumer, so the cache read stays a pure
  int8->bf16 convert: long-context AR steps stream ~1 byte per cache
  element instead of 2 — the cache is the dominant HBM read once
  batch*T*layers*kv_heads*head_dim rivals the (possibly already int8)
  weight bytes.
  """
  initialized = module.has_variable("cache", "idx")
  batch_size, update_len, num_heads, head_dim = k.shape
  # [B, T, K, H] -> storage layout [B, K, T, H] (see docstring).
  k = k.transpose(0, 2, 1, 3)
  v = v.transpose(0, 2, 1, 3)
  compute_dtype = k.dtype
  cache_dtype = cache_dtype or k.dtype
  quant = cache_dtype == "int8"
  if not quant and jnp.issubdtype(jnp.dtype(cache_dtype), jnp.integer):
    # An integer dtype object (e.g. jnp.int8) would silently store bf16
    # values astype(int8) with no scales — garbage attention. Only the
    # literal "int8" string selects the quantized (scaled) cache layout.
    raise ValueError(
        f"Integer cache_dtype {cache_dtype!r} is not a storage format; "
        "pass cache_dtype='int8' to get the quantized KV cache.")

  idx = module.variable("cache", "idx", jnp.zeros, (batch_size,), jnp.int32)
  kv_shape = (batch_size, num_heads, cache_size, head_dim)
  store_dtype = jnp.int8 if quant else cache_dtype
  k_cache = module.variable("cache", "k_cache", jnp.zeros, kv_shape,
                            store_dtype)
  v_cache = module.variable("cache", "v_cache", jnp.zeros, kv_shape,
                            store_dtype)
  if quant:
    s_shape = (batch_size, num_heads, cache_size, 1)
    k_scale = module.variable("cache", "k_scale", jnp.zeros, s_shape,
                              jnp.float32)
    v_scale = module.variable("cache", "v_scale", jnp.zeros, s_shape,
                              jnp.float32)
    (k, k_s), (v, v_s) = _quant_kv(k), _quant_kv(v)

  if initialized:
    assert update_len == 1, update_len
    slot = (0, 0, idx.value[0], 0)
    write = lambda var, new: jax.lax.dynamic_update_slice(
        var.value, new, slot)
    k_cache.value = write(k_cache, k.astype(store_dtype))
    v_cache.value = write(v_cache, v.astype(store_dtype))
    if quant:
      k_scale.value = write(k_scale, k_s)
      v_scale.value = write(v_scale, v_s)
  else:
    pad = ((0, 0), (0, 0), (0, cache_size - update_len), (0, 0))
    k_cache.value = jnp.pad(k.astype(store_dtype), pad)
    v_cache.value = jnp.pad(v.astype(store_dtype), pad)
    if quant:
      k_scale.value = jnp.pad(k_s, pad)
      v_scale.value = jnp.pad(v_s, pad)
  idx.value = idx.value + update_len

  if quant:
    # Return the RAW int8 cache plus the per-slot scales: the scales
    # commute through both attention contractions, so the consumer folds
    # them into the [.., T, S]-shaped logits/probs instead of the
    # [B, K, S, H] operand — the big cache read is then a pure int8->bf16
    # convert (measured 1.28x over multiply-on-operand at T=4.3k; padded
    # slots carry scale 0 so they still contribute exactly 0). The fused
    # decode kernel (ops/decode_attention.py) skips even the convert:
    # it DMAs the int8 plane to VMEM and dequantizes on-chip.
    return k_cache.value, v_cache.value, (k_scale.value, v_scale.value)
  return (k_cache.value.astype(compute_dtype),
          v_cache.value.astype(compute_dtype), None)


def trunc_norm_init(in_axis, out_axis, batch_axis=()):
  kw = dict(in_axis=in_axis, out_axis=out_axis, batch_axis=batch_axis)
  return nn.initializers.variance_scaling(1.0, "fan_in",
                                          "truncated_normal", **kw)


def _scale_shape(shape, contract):
  """Weight shape -> per-output-channel scale shape (contracted axes -> 1)."""
  contract = {a % len(shape) for a in contract}
  return tuple(1 if i in contract else s for i, s in enumerate(shape))


def _dequant(w_q, scale, dtype):
  """int8 weight + per-channel scale -> compute-dtype weight.

  Written as convert-then-multiply so XLA fuses it into the consuming
  matmul's operand read: HBM traffic stays 1 byte/weight (the whole point
  of weight-only quantization on a weight-read-bound decode step).
  """
  return w_q.astype(dtype) * scale.astype(dtype)


class Einsum(nn.Module):
  shape: tuple
  w_init: nn.initializers.Initializer = nn.initializers.zeros_init()
  quant: bool = False
  contract: tuple = ()  # axes of `shape` consumed by the einsum (for scales)

  @nn.compact
  def __call__(self, eqn, x):
    if not self.quant:
      return jnp.einsum(eqn, x, self.param("w", self.w_init, self.shape))
    w_q = self.param("w", nn.initializers.zeros_init(), self.shape,
                     jnp.int8)
    scale_shape = _scale_shape(self.shape, self.contract)
    scale = self.param("w_scale", nn.initializers.ones_init(), scale_shape,
                       jnp.float32)
    return jnp.einsum(eqn, x, _dequant(w_q, scale, x.dtype))


class RMSNorm(nn.Module):
  """Zero-centered-gain RMS norm (gain stored as scale-1, gemma style)."""

  @nn.compact
  def __call__(self, x):
    gain = 1 + self.param("scale", nn.initializers.zeros_init(),
                          (x.shape[-1]))
    mean_sq = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return jnp.asarray(x * jax.lax.rsqrt(mean_sq + 1e-6)) * gain


class Embedder(nn.Module):
  """Tied input/output embedding."""
  vocab_size: int
  embed_dim: int
  quant: bool = False

  def setup(self):
    if self.quant:
      # Per-vocab-row int8: encode gathers+dequants rows (exact same values
      # decode sees); decode matmuls the int8 table and applies the row
      # scales in the epilogue, so the 2-byte/weight table read becomes 1.
      self.input_embedding_table = self.param(
          "input_embedding", nn.initializers.zeros_init(),
          (self.vocab_size, self.embed_dim), jnp.int8)
      self.input_embedding_scale = self.param(
          "input_embedding_scale", nn.initializers.ones_init(),
          (self.vocab_size, 1), jnp.float32)
    else:
      self.input_embedding_table = self.param(
          "input_embedding",
          nn.initializers.variance_scaling(
              1.0, "fan_in", "normal", in_axis=1, out_axis=0),
          (self.vocab_size, self.embed_dim))

  def encode(self, x):
    if self.quant:
      rows = self.input_embedding_table[(x,)]
      x = rows.astype(jnp.float32) * self.input_embedding_scale[(x,)]
    else:
      x = self.input_embedding_table[(x,)]
    return x * jnp.sqrt(self.embed_dim).astype(x.dtype)

  def decode(self, x):
    table_t = self.input_embedding_table.T
    if not self.quant:
      return jnp.dot(x, table_t)
    row_scales = self.input_embedding_scale[:, 0].astype(x.dtype)
    return jnp.dot(x, table_t.astype(x.dtype)) * row_scales


class Attention(nn.Module):
  """MHA / MQA / GQA with RoPE, optional softcap and KV cache."""
  num_heads: int
  num_kv_heads: int
  features: int
  head_dim: int
  query_pre_attn_norm: str
  attn_logits_softcap: Optional[float]
  cache_dtype: Optional[str] = None
  attn_impl: str = "xla"
  decode_impl: str = "xla"  # "flash": fused Pallas AR-step kernel
  quant: bool = False

  def setup(self):
    H, K, D, F = (self.num_heads, self.num_kv_heads, self.features,
                  self.head_dim)
    def proj(shape, in_axis, out_axis, contract):
      return Einsum(shape=shape, quant=self.quant, contract=contract,
                    w_init=trunc_norm_init(in_axis, out_axis))
    if H == K:  # MHA: one fused QKV projection
      self.qkv_einsum = proj((3, H, D, F), (2,), (0, 1, 3), (-2,))
    else:       # MQA/GQA: Q at H heads, fused KV at K heads
      self.q_einsum = proj((H, D, F), (1,), (0, 2), (-2,))
      self.kv_einsum = proj((2, K, D, F), (2,), (0, 1, 3), (-2,))
    self.attn_vec_einsum = proj((H, F, D), (0, 1), (2,), (-3, -2))

  @nn.compact
  def __call__(self, x, positions, attn_mask, decode, deterministic=True,
               seg=None):
    if self.num_kv_heads != self.num_heads:
      q = self.q_einsum("BTD,NDH->BTNH", x)
      k, v = self.kv_einsum("BSD,2KDH->2BSKH", x)
    else:
      q, k, v = self.qkv_einsum("BSD,3KDH->3BSKH", x)

    q, k = (_apply_rope(t, positions=positions) for t in (q, k))
    q_scales = {"rsqrt_head_dim": self.head_dim,
                "rsqrt_emb_per_head": self.features // self.num_heads}
    if self.query_pre_attn_norm not in q_scales:
      raise ValueError(self.query_pre_attn_norm)
    q *= q_scales[self.query_pre_attn_norm] ** -0.5
    kv_scales = None
    if decode:
      k, v, kv_scales = _update_kv_cache(
          self, k, v, cache_size=attn_mask.shape[-1],
          cache_dtype=self.cache_dtype)
      from big_vision_tpu.ops import decode_attention as _da
      if (self.decode_impl == "flash" and q.shape[1] == 1
          and _da.fits(k.shape[2], k.shape[3], k.dtype.itemsize)):
        # Fused AR step: reads the cache plane in its storage dtype (int8
        # stays 1 byte/element on the HBM->VMEM DMA), dequantizes on-chip,
        # one masked softmax per (batch, kv_head). Falls through to the
        # einsum path for prefill (q_len > 1) or VMEM-overflowing planes.
        b, _, n, h = q.shape
        grouped = q[:, 0].reshape(b, self.num_kv_heads,
                                  n // self.num_kv_heads, h)
        ks, vs = kv_scales if kv_scales else (None, None)
        mixed = _da.decode_attention(
            grouped, k, v, attn_mask[:, 0, 0, :], k_scale=ks, v_scale=vs,
            logits_softcap=self.attn_logits_softcap or 0.0)
        return self.attn_vec_einsum(
            "BTNH,NHD->BTD", mixed.reshape(b, 1, n, h))
      if kv_scales is not None:
        # XLA einsum path over a quantized cache: pure int8->bf16 convert
        # on the operands; the scales fold into the logits/probs below.
        k, v = k.astype(q.dtype), v.astype(q.dtype)

    if (self.attn_impl in ("flash", "ring") and not decode
        and seg is not None and not self.attn_logits_softcap):
      # Fused flash / context-parallel ring path (training): `seg`
      # encodes the same prefix-LM mask as attn_mask (see
      # ops/flash_attention.py). Both impls apply 1/sqrt(head_dim); q is
      # already pre-normalized, so cancel their scale.
      if self.num_kv_heads != self.num_heads:
        rep = self.num_heads // self.num_kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
      qf = (q * (self.head_dim ** 0.5)).astype(v.dtype)
      if self.attn_impl == "ring":
        # Sequence-parallel: shards T over the ambient mesh's "seq" axis
        # (exact; K/V ride the ICI ring), single-device math otherwise.
        from big_vision_tpu.ops import ring_attention as _ra
        encoded = _ra.ring_attention_auto(qf, k, v, seg=seg)
      else:
        from big_vision_tpu.ops import flash_attention as _fa
        encoded = _fa.flash_attention(qf, k, v, seg=seg)
      return self.attn_vec_einsum("BTNH,NHD->BTD", encoded)

    # Decode reads the cache in its [B, K, S, H] storage layout (contiguous
    # [S, H] plane per batch dim of the contraction); training contracts
    # the projections in their native [B, S, K, H].
    kv = "BKSH" if decode else "BSKH"
    # Per-slot int8 cache scales commute through both contractions
    # (absmax over H, the contracted axis), so they're applied to the
    # [B,K,G,T,S] logits/probs — B*K*G*S elements — instead of the
    # [B,K,S,H] operands: the cache read stays a pure int8->bf16 convert.
    fold = (lambda s: s[..., 0][:, :, None, None, :])  # [B,K,S,1]->[B,K,1,1,S]
    b, t, n, h = q.shape
    grouped = q.reshape(b, t, self.num_kv_heads, n // self.num_kv_heads, h)
    logits = jnp.einsum(f"BTKGH,{kv}->BKGTS", grouped, k)
    logits = logits.astype(jnp.float32)
    if kv_scales is not None:
      logits = logits * fold(kv_scales[0])

    if cap := self.attn_logits_softcap:
      logits = cap * jnp.tanh(logits / cap)

    expected_mask = (b, 1, t, k.shape[kv.index("S")])
    if attn_mask.shape != expected_mask:
      raise ValueError(f"Bad mask shape {attn_mask.shape} for q={q.shape} "
                       f"k={k.shape}")
    big_neg = -2.3819763e38  # matches the released gemma code
    masked = jnp.where(attn_mask[:, :, None, :, :], logits, big_neg)
    probs = jax.nn.softmax(masked, axis=-1)
    if kv_scales is not None:
      probs = probs * fold(kv_scales[1])
    probs = probs.astype(k.dtype)

    mixed = jnp.einsum(f"BKGTS,{kv}->BTKGH", probs, v).reshape(b, t, n, h)
    return self.attn_vec_einsum("BTNH,NHD->BTD", mixed)


class FeedForward(nn.Module):
  """Gated-GeLU MLP."""
  features: int
  hidden_dim: int
  quant: bool = False

  @nn.compact
  def __call__(self, x):
    if self.quant:
      w_q = self.param(
          "gating_einsum", nn.initializers.zeros_init(),
          (2, self.features, self.hidden_dim), jnp.int8)
      gating_scale = self.param(
          "gating_einsum_scale", nn.initializers.ones_init(),
          (2, 1, self.hidden_dim), jnp.float32)
      # Dequantize each gating half separately so every convert+scale has
      # exactly ONE consuming matmul: a shared dequant of the (2, F, H)
      # stack has two consumers, which stops XLA fusing it into the dot
      # operand reads and materializes the bf16 weights in HBM (measured
      # 2.2x slower per gating pair on v5e).
      gate = nn.gelu(jnp.dot(x, _dequant(w_q[0], gating_scale[0], x.dtype)))
      acts = gate * jnp.dot(x, _dequant(w_q[1], gating_scale[1], x.dtype))
    else:
      w_gating = self.param(
          "gating_einsum",
          trunc_norm_init(in_axis=(1,), out_axis=(0, 2)),
          (2, self.features, self.hidden_dim))
      gate = nn.gelu(jnp.dot(x, w_gating[0]))
      acts = gate * jnp.dot(x, w_gating[1])
    if self.quant:
      w_linear = self.param(
          "linear", nn.initializers.zeros_init(),
          (self.hidden_dim, self.features), jnp.int8)
      linear_scale = self.param(
          "linear_scale", nn.initializers.ones_init(),
          (1, self.features), jnp.float32)
      w_linear = _dequant(w_linear, linear_scale, x.dtype)
    else:
      w_linear = self.param(
          "linear", trunc_norm_init(in_axis=(0,), out_axis=(1,)),
          (self.hidden_dim, self.features))
    return jnp.dot(acts, w_linear)


class Block(nn.Module):
  num_heads: int
  num_kv_heads: int
  embed_dim: int
  head_dim: int
  hidden_dim: int
  query_pre_attn_norm: str
  attn_logits_softcap: Optional[float]
  post_norms: bool
  dropout: float = 0.0
  dropout_bdims: tuple = ()
  cache_dtype: Optional[str] = None
  attn_impl: str = "xla"
  decode_impl: str = "xla"
  quant: bool = False

  def setup(self):
    self.pre_attention_norm = RMSNorm()
    self.pre_ffw_norm = RMSNorm()
    if self.post_norms:
      self.post_attention_norm = RMSNorm()
      self.post_ffw_norm = RMSNorm()
    attn_kw = dict(features=self.embed_dim,
                   query_pre_attn_norm=self.query_pre_attn_norm,
                   attn_logits_softcap=self.attn_logits_softcap,
                   cache_dtype=self.cache_dtype, attn_impl=self.attn_impl,
                   decode_impl=self.decode_impl)
    self.attn = Attention(num_heads=self.num_heads, head_dim=self.head_dim,
                          num_kv_heads=self.num_kv_heads, quant=self.quant,
                          **attn_kw)
    self.mlp = FeedForward(features=self.embed_dim, quant=self.quant,
                           hidden_dim=self.hidden_dim)
    self.drop = (nn.Dropout(self.dropout, self.dropout_bdims)
                 if self.dropout else (lambda x, _: x))

  def __call__(self, x, unused_scan_arg, positions, attn_mask, decode,
               deterministic=True, seg=None):
    x = nn.with_logical_constraint(x, ("act_batch", "act_len", "act_emb"))
    y = self.attn(self.pre_attention_norm(x), positions, attn_mask, decode,
                  deterministic, seg)
    if self.post_norms:
      y = self.post_attention_norm(y)
    y = self.drop(y, deterministic)
    x = x + y
    y = self.mlp(self.pre_ffw_norm(x))
    y = self.drop(y, deterministic)
    if self.post_norms:
      y = self.post_ffw_norm(y)
    return x + y, unused_scan_arg


def decoder_stack(owner, depth, scan, remat_policy, block_kw):
  """Builds the Gemma block stack under `owner`'s "layers" scope.

  `owner` is a module or a flax Scope. Shared by this file's Model and
  jetformer's backbone: one place owns the scan-vs-pyloop choice (param
  layout: stacked leading depth axis vs "layers/<i>" subtrees), the remat
  wrapping, and the cache axis layout.
  Returns a runner fn(x, positions, mask, decode, deterministic, seg) -> x.
  """
  cls = Block
  if remat_policy != "none":
    cls = nn.remat(
        cls, prevent_cse=not scan,
        static_argnums=(5, 6),  # 0=self, 5=decode, 6=deterministic
        policy=getattr(jax.checkpoint_policies, remat_policy))
  layers = getattr(owner, "scope", owner).push("layers")
  if scan:
    stack = [nn.scan(
        cls,
        # Cache axis 1: batch stays the leading dimension of every cache leaf.
        variable_axes={"params": 0, "cache": 1},
        split_rngs={"params": True, "dropout": True},
        in_axes=nn.broadcast, length=depth)(parent=layers, **block_kw)]
  else:
    stack = [cls(parent=layers.push(str(i)), **block_kw)
             for i in range(depth)]

  def run(x, positions, mask, decode, deterministic, seg=None):
    carry = ()
    for block in stack:
      x, carry = block(x, carry, positions, mask, decode, deterministic, seg)
    return x
  return run


def prep_positions_mask(x, positions, mask, decode):
  """Default positions/mask and normalize mask to [B, 1, T, cache]."""
  b, t, _ = x.shape
  if decode:
    assert positions is not None and mask is not None, (
        "decode=True requires explicit positions and mask")
  if positions is None:
    positions = jnp.arange(t, dtype=jnp.int32)[None, :]
  assert positions.shape[1] == t
  if mask is None:
    mask = jnp.tril(jnp.ones((b, 1, t, t), jnp.bool_))  # plain causal
  elif mask.ndim == 3:
    mask = mask[:, None, :, :]
  cache_size = max(t, mask.shape[-1])
  assert mask.shape == (b, 1, t, cache_size), mask.shape
  return positions, mask


class Model(nn.Module):
  """Gemma decoder-only LM."""
  variant: str
  width: int
  depth: int
  mlp_dim: int
  num_heads: int
  num_kv_heads: int
  head_dim: int
  norm_eps: float
  vocab_size: int
  query_pre_attn_norm: str = "rsqrt_head_dim"
  final_logits_softcap: float = 0.0
  attn_logits_softcap: float = 0.0
  post_norms: bool = False
  dropout: float = 0.0
  dropout_bdims: tuple = ()
  cache_dtype: Optional[str] = None
  embed_dtype: str = "float32"
  scan: bool = False
  remat_policy: str = "none"
  attn_impl: str = "xla"
  # AR-step attention: "flash" uses the fused Pallas decode kernel
  # (ops/decode_attention.py) — reads the KV cache in storage dtype and
  # dequantizes in VMEM; the einsum path is the fallback/default.
  decode_impl: str = "xla"
  # Weight-only int8 serving mode (beyond the reference): params carry int8
  # weights + per-output-channel scales (see quantize_params). Decode is
  # weight-read-bound, so halving weight bytes ~halves the AR step.
  quant: bool = False

  @nn.compact
  def __call__(self, tokens, *, embedded_prefix=None, embed_only=False,
               pre_logits=None, positions=None, mask=None, decode=False,
               deterministic=True, seg=None):
    """Embed-only, logits-from-pre-logits, or full forward (see ref :460)."""
    out = {}
    embedder = Embedder(vocab_size=self.vocab_size, embed_dim=self.width,
                        quant=self.quant, name="embedder")

    if pre_logits is not None:
      x = out["pre_logits"] = pre_logits
      logits = out["logits"] = embedder.decode(x)
      return logits, out

    parts = []
    if embedded_prefix is not None:
      parts.append(embedded_prefix)
    if tokens is not None:
      parts.append(embedder.encode(tokens))
    x = jnp.concatenate(parts, axis=-2).astype(self.embed_dtype)
    batch_size, seq_len, _ = x.shape

    if embed_only:
      return x

    positions, mask = prep_positions_mask(x, positions, mask, decode)

    block_kw = dict(
        embed_dim=self.width, hidden_dim=self.mlp_dim,
        num_heads=self.num_heads, num_kv_heads=self.num_kv_heads,
        head_dim=self.head_dim, post_norms=self.post_norms,
        query_pre_attn_norm=self.query_pre_attn_norm,
        attn_logits_softcap=self.attn_logits_softcap,
        dropout=self.dropout, dropout_bdims=self.dropout_bdims,
        cache_dtype=self.cache_dtype, attn_impl=self.attn_impl,
        decode_impl=self.decode_impl, quant=self.quant)
    run = decoder_stack(self, self.depth, self.scan, self.remat_policy,
                        block_kw)
    x = run(x, positions, mask, decode, deterministic, seg)
    assert x.dtype == jnp.dtype(self.embed_dtype)
    out["encoded"] = x

    x = out["pre_logits"] = RMSNorm(name="final_norm")(x)
    x = out["logits_pre_norm"] = embedder.decode(x)
    if cap := self.final_logits_softcap:
      x = cap * jnp.tanh(x / cap)
    out["logits"] = x
    return x, out


# -------------------------------------------------------------------------
# Weight-only int8 quantization (serving; beyond the reference).
# -------------------------------------------------------------------------


# (parent module, leaf) -> (einsum-contracted axes, scale leaf name).
# Axes are NEGATIVE so the same rule covers the pyloop layout and the scan
# layout (which stacks a leading depth axis on every block weight).
_QUANT_LEAVES = {
    ("qkv_einsum", "w"): ((-2,), "w_scale"),
    ("q_einsum", "w"): ((-2,), "w_scale"),
    ("kv_einsum", "w"): ((-2,), "w_scale"),
    ("attn_vec_einsum", "w"): ((-3, -2), "w_scale"),
    ("mlp", "gating_einsum"): ((-2,), "gating_einsum_scale"),
    ("mlp", "linear"): ((-2,), "linear_scale"),
    ("embedder", "input_embedding"): ((-1,), "input_embedding_scale"),
}


def quantize_params(params):
  """float gemma params -> the int8 + per-channel-scale serving layout.

  Symmetric absmax quantization per OUTPUT channel (scales broadcast over
  the einsum-contracted axes only, so dequantization commutes with the
  matmul). The result matches the param tree `Model(quant=True)` expects;
  norms and any non-matmul leaves stay float. AR decoding is weight-read
  bound (docs/perf_notes.md "Serving"), so 1-byte weights ~halve the step.

  Typical serving flow::

    params = gemma.load(init, "gemma2b.npz", model_cfg)
    params = gemma.quantize_params(params)
    model = gemma.Model(**get_config(variant), quant=True, scan=False)
  """
  flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(params))
  out, n_quant = {}, 0
  for path, w in flat.items():
    rule = _QUANT_LEAVES.get((path[-2] if len(path) > 1 else "", path[-1]))
    if rule is None:
      out[path] = w
      continue
    contract, scale_name = rule
    w = jnp.asarray(w, jnp.float32)
    axes = tuple(a % w.ndim for a in contract)
    absmax = jnp.max(jnp.abs(w), axis=axes, keepdims=True)
    scale = jnp.maximum(absmax, 1e-30) / 127.0
    out[path] = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out[path[:-1] + (scale_name,)] = scale
    n_quant += 1
  assert n_quant, "quantize_params: no quantizable gemma weights found"
  return flax.traverse_util.unflatten_dict(out)


# -------------------------------------------------------------------------
# Checkpoint loading (orbax DeepMind release layout + bv npz).
# -------------------------------------------------------------------------


def _load_orbax(path):
  """DeepMind orbax release -> our layout (stack per-layer subtrees)."""
  import orbax.checkpoint as ocp
  flat = ocp.PyTreeCheckpointer().restore(path)
  params = flax.traverse_util.unflatten_dict(flat, sep="/")["transformer"]
  per_layer = [params.pop(k)
               for k in sorted((k for k in list(params)
                                if k.startswith("layer_")),
                               key=lambda k: int(k.split("_")[1]))]
  params["layers"] = jax.tree.map(lambda *xs: np.stack(xs), *per_layer)
  # The release nests each mlp einsum one level deeper ({.../w}); ours
  # stores the arrays directly.
  mlp = params["layers"]["mlp"]
  for name in ("gating_einsum", "linear"):
    mlp[name] = mlp[name].pop("w")
  return params


def _del_pad_rows(params):
  table = params["embedder"]["input_embedding"]
  if table.shape[0] == 256_128:  # some releases pad the vocab
    table = jax.device_get(table)[:256_000]
    params["embedder"]["input_embedding"] = table


def _maybe_transpose_gating_einsum(params):
  # Some releases store gating as [..., hidden, width]; ours contracts
  # [..., width, hidden]. Orientation is detectable because hidden>width.
  gating = params["layers"]["mlp"]["gating_einsum"]
  if gating.shape[-2] > gating.shape[-1]:
    params["layers"]["mlp"]["gating_einsum"] = np.swapaxes(gating, -1, -2)


def scan_to_pyloop(params):
  """Stacked scan layout (layers/{...} leading L dim) -> per-layer
  layers/{i}/{...}. Serving tip: the unrolled (scan=False) model decodes
  ~2.2x faster on TPU (measured gemma_2b AR step 6.6 vs 14.5 ms on v5e:
  XLA prefetches each layer's weights during the previous layer, which
  scan's dynamic-slice reads defeat), so convert scan-trained params
  with this before building a serving model."""
  params = jax.tree.map(lambda x: x, params)
  stacked = params.pop("layers")
  depth = jax.tree.leaves(stacked)[0].shape[0]
  params["layers"] = {
      str(i): jax.tree.map(lambda x, i=i: x[i], stacked)
      for i in range(depth)}
  return params


def pyloop_to_scan(params):
  """Inverse of scan_to_pyloop."""
  params = jax.tree.map(lambda x: x, params)
  per_layer = params.pop("layers")
  depth = 1 + max(int(k) for k in per_layer)
  params["layers"] = jax.tree.map(
      lambda *xs: np.stack(xs), *[per_layer[str(i)] for i in range(depth)])
  return params


def load(init_params, init_file, model_cfg=None, dont_load=()):
  """Loads a Gemma checkpoint (orbax dir or npz), with vocab extension.

  Handles both layer layouts: checkpoints load into the stacked (scan)
  form and are converted to per-layer subtrees when the target model was
  built with scan=False (detected from init_params, falling back to
  model_cfg['scan'])."""
  model_cfg = dict(model_cfg or {})
  if isinstance(init_file, str) and init_file.endswith(".npz"):
    params = u.load_params(init_file)
  else:
    params = _load_orbax(init_file)
    _del_pad_rows(params)
    _maybe_transpose_gating_einsum(params)

  def extend_rows(emb, target_rows):
    missing = target_rows - emb.shape[0]
    if missing == 0:
      return emb
    assert missing > 0, "Can't shrink the vocab"
    if not np.issubdtype(np.asarray(emb).dtype, np.floating):
      # int8 rows would quantize randn*0.02 to all zeros and the embedding
      # scale tensor would keep its old row count -> shape mismatch later.
      raise ValueError(
          "vocab_size extension needs a float checkpoint; extend rows "
          "BEFORE quantization (tools/quantize_ckpt.py), not after.")
    new = (np.random.randn(missing, emb.shape[1]) * 0.02).astype(emb.dtype)
    return np.concatenate([np.asarray(emb), new])

  if "vocab_size" in model_cfg:
    params["embedder"]["input_embedding"] = extend_rows(
        params["embedder"]["input_embedding"], model_cfg["vocab_size"])

  def is_pyloop(p):
    return isinstance(p.get("layers"), dict) and "0" in p["layers"]
  if init_params is not None and "layers" in init_params:
    target_pyloop = is_pyloop(init_params)
  else:
    target_pyloop = not model_cfg.get("scan", False)
  if is_pyloop(params) != target_pyloop:
    params = scan_to_pyloop(params) if target_pyloop \
        else pyloop_to_scan(params)

  # Auto-quantize float checkpoints into a quant=True target (detected from
  # init_params' int8 leaves), like the layout conversion above. Already-
  # quantized checkpoints (tools/quantize_ckpt.py output) pass through.
  def any_int8(tree):
    return any(getattr(x, "dtype", None) == jnp.int8
               for x in jax.tree.leaves(tree))
  if init_params is not None and any_int8(init_params) \
      and not any_int8(params):
    params = jax.device_get(quantize_params(params))
  if init_params is not None and any_int8(params) \
      and not any_int8(init_params):
    raise ValueError(
        "Loading an int8-quantized checkpoint into a float (quant=False) "
        "model; build the model with quant=True, or re-export the "
        "checkpoint in float.")

  return common.merge_params(params, init_params, dont_load)
