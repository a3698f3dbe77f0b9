"""Vision Transformer, TPU-first.

Capability parity with reference big_vision/models/vit.py (variant table,
pool types gap/map/tok/0/none, sincos2d/learned posemb, scan+remat encoder,
posemb resampling, checkpoint surgery, AugReg/DeiT3/SigLIP vanity names).

TPU-first design points:
  * One attention call-site (`ops.attention`) with a selectable backend, so
    the Pallas flash kernel slots in without touching the model.
  * `dtype_mm` controls matmul dtype (bfloat16 in all perf configs) AND the
    block LayerNorm output dtype (keeping the residual stream bf16; LN
    statistics still accumulate in f32, and the final encoder_norm stays
    f32). Softmax always accumulates f32.
  * Layer-scan + remat for O(1) compile time and activation memory control.
  * Logical activation axes ("act_batch", "act_len", "act_emb") annotated at
    block boundaries so any mesh mapping (DP/FSDP/TP/SP) is a config choice.

Param tree names match the reference exactly so published .npz checkpoints
load unmodified.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.models import common
from big_vision_tpu.ops import attention as attn_ops


def posemb_sincos_2d(h, w, width, temperature=10_000., dtype=jnp.float32):
  """2D sin-cos position embedding (MoCo-v3 style). Ref vit.py:34.

  Layout along the feature axis: [sin(x), cos(x), sin(y), cos(y)], each a
  width/4-band geometric frequency sweep from 1 down to 1/temperature.
  """
  assert width % 4 == 0, "Width must be a multiple of 4 for sincos posemb"
  bands = width // 4
  freqs = temperature ** (-jnp.arange(bands) / (bands - 1))
  grid_y, grid_x = jnp.mgrid[:h, :w]
  phase = [grid_x.reshape(-1, 1) * freqs, grid_y.reshape(-1, 1) * freqs]
  pe = jnp.concatenate(
      [trig(p) for p in phase for trig in (jnp.sin, jnp.cos)], axis=-1)
  return pe[None].astype(dtype)


def get_posemb(module, typ, seqshape, width, name, dtype=jnp.float32):
  if typ == "sincos2d":
    return posemb_sincos_2d(*seqshape, width, dtype=dtype)
  if typ == "learn":
    shape = (1, int(np.prod(seqshape)), width)
    init = nn.initializers.normal(stddev=width ** -0.5)
    return module.param(name, init, shape, dtype)
  raise ValueError(f"Unknown posemb type: {typ}")


def _constrain(x):
  return nn.with_logical_constraint(x, ("act_batch", "act_len", "act_emb"))


class PatchEmbed(nn.Module):
  """Non-overlapping patchify as a reshape + matmul.

  Param tree is identical to the nn.Conv it replaces (kernel [p,p,c,width]
  + bias, name "embedding") so every published checkpoint and the FlexiViT
  kernel-resampling code keep working — but the compute is an MXU matmul
  over [B*HW/p^2, p*p*c]: a strided stride-p conv with c_in=3 maps onto
  the MXU at <15% efficiency, while the equivalent matmul (contraction
  p*p*c=768) runs at full tilt (measured 15 -> ~110 TFLOP/s on v5e).
  """
  width: int
  patch_size: Sequence[int]
  dtype_mm: str = "float32"
  padding: str = "VALID"  # VALID: crop remainder rows/cols (ViT conv
  # semantics); SAME: zero-pad up to the next patch multiple (what the
  # default nn.Conv the mixer stem replaced did).

  @nn.compact
  def __call__(self, image):
    ph, pw = self.patch_size
    n, h, w, c = image.shape
    kernel = self.param(
        "kernel", nn.initializers.lecun_normal(), (ph, pw, c, self.width),
        jnp.float32)
    bias = self.param("bias", nn.initializers.zeros, (self.width,),
                      jnp.float32)
    if h % ph or w % pw:
      if self.padding == "SAME":
        image = jnp.pad(image, ((0, 0), (0, -h % ph), (0, -w % pw),
                                (0, 0)))
      else:  # VALID: drop the remainder, like strided conv
        image = image[:, :h - h % ph, :w - w % pw]
      n, h, w, c = image.shape
    gh, gw = h // ph, w // pw
    x = image.reshape(n, gh, ph, gw, pw, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(n, gh * gw,
                                                     ph * pw * c)
    y = jnp.dot(x.astype(self.dtype_mm),
                kernel.reshape(ph * pw * c, self.width)
                .astype(self.dtype_mm))
    y = y + bias.astype(y.dtype)
    return y.reshape(n, gh, gw, self.width)


class MultiHeadAttention(nn.Module):
  """MHA with a swappable core; param names mirror flax's MHDPA for ckpt
  compat (query/key/value/out DenseGeneral kernels)."""
  num_heads: int
  dtype_mm: str = "float32"
  attn_impl: str = "auto"
  dropout: float = 0.0

  @nn.compact
  def __call__(self, xq, xkv, mask=None, deterministic=True, seg=None):
    d = xq.shape[-1]
    assert d % self.num_heads == 0, (d, self.num_heads)
    head_dim = d // self.num_heads
    proj = lambda name: nn.DenseGeneral(
        (self.num_heads, head_dim), dtype=self.dtype_mm,
        kernel_init=nn.initializers.xavier_uniform(), name=name)
    q = proj("query")(xq)
    k = proj("key")(xkv)
    v = proj("value")(xkv)
    out = attn_ops.dot_product_attention(q, k, v, mask=mask,
                                         impl=self.attn_impl, seg=seg)
    out = nn.DenseGeneral(
        d, axis=(-2, -1), dtype=self.dtype_mm,
        kernel_init=nn.initializers.xavier_uniform(), name="out")(out)
    return out


class MlpBlock(nn.Module):
  """Feed-forward block. Ref vit.py:57."""
  mlp_dim: Optional[int] = None  # Defaults to 4x input dim
  dtype_mm: str = "float32"
  dropout: float = 0.0
  use_bias: bool = True

  @nn.compact
  def __call__(self, x, deterministic=True):
    d = x.shape[-1]
    init_kw = dict(kernel_init=nn.initializers.xavier_uniform(),
                   bias_init=nn.initializers.normal(stddev=1e-6))
    dense = lambda features: nn.Dense(features, dtype=self.dtype_mm,
                                      use_bias=self.use_bias, **init_kw)
    h = nn.gelu(_constrain(dense(self.mlp_dim or 4 * d)(x)))
    h = nn.Dropout(rate=self.dropout)(h, deterministic)
    return dense(d)(h)


class Encoder1DBlock(nn.Module):
  """Pre-norm transformer block. Ref vit.py:81."""
  num_heads: int = 12
  mlp_dim: Optional[int] = None
  dtype_mm: str = "float32"
  attn_impl: str = "auto"
  dropout: float = 0.0

  @nn.compact
  def __call__(self, x, deterministic=True, mask=None, seg=None):
    out = {}
    # dtype=dtype_mm keeps the residual stream in bf16: the default f32
    # LayerNorm output promotes every residual add (and all inter-block
    # HBM traffic) to f32 — measured 50 ms of pure LN time per B/16 step.
    # Stats still accumulate in f32 inside flax's _compute_stats.
    norm = lambda: nn.LayerNorm(dtype=self.dtype_mm)
    drop = nn.Dropout(rate=self.dropout)
    if mask is not None and mask.ndim == 3:
      mask = mask[..., None, :, :]  # add the (broadcast) head dim

    x = _constrain(x)
    delta = norm()(x)
    delta = out["sa"] = MultiHeadAttention(
        num_heads=self.num_heads, dtype_mm=self.dtype_mm,
        attn_impl=self.attn_impl, name="MultiHeadDotProductAttention_0")(
            delta, delta, mask=mask, deterministic=deterministic, seg=seg)
    x = out["+sa"] = x + drop(_constrain(delta), deterministic)

    ff = MlpBlock(mlp_dim=self.mlp_dim, dtype_mm=self.dtype_mm,
                  dropout=self.dropout)
    delta = out["mlp"] = ff(norm()(x), deterministic)
    x = out["+mlp"] = x + drop(_constrain(delta), deterministic)
    return _constrain(x), out


class Encoder(nn.Module):
  """Stack of blocks; lax.scan-over-layers + remat when `scan`. Ref :115."""
  depth: int
  num_heads: int = 12
  mlp_dim: Optional[int] = None
  dropout: float = 0.0
  dtype_mm: str = "float32"
  attn_impl: str = "auto"
  scan: bool = False
  remat_policy: str = "nothing_saveable"

  @nn.compact
  def __call__(self, x, deterministic=True, mask=None, seg=None):
    out = {}
    block_kw = dict(num_heads=self.num_heads, mlp_dim=self.mlp_dim,
                    attn_impl=self.attn_impl, dtype_mm=self.dtype_mm,
                    dropout=self.dropout)
    if self.scan:
      remat_policy = getattr(jax.checkpoint_policies, self.remat_policy,
                             None)
      block = nn.remat(Encoder1DBlock, prevent_cse=False,
                       policy=remat_policy,
                       static_argnums=(2,))  # 0=self, 2=deterministic
      scan_kw = dict(length=self.depth, in_axes=nn.broadcast,
                     variable_axes={"params": 0},
                     split_rngs={"dropout": True, "params": True})
      stack = nn.scan(block, **scan_kw)(name="encoderblock", **block_kw)
      x, scan_out = stack(x, deterministic, mask, seg)
      peel = lambda i: jax.tree.map(lambda leaf: leaf[i], scan_out)
      out.update({f"block{i:02d}": peel(i) for i in range(self.depth)})
    else:
      for i in range(self.depth):
        layer = Encoder1DBlock(name=f"encoderblock_{i}", **block_kw)
        x, out[f"block{i:02d}"] = layer(x, deterministic, mask, seg)
      out["pre_ln"] = x
    final_norm = nn.LayerNorm(name="encoder_norm")
    return final_norm(x), out


class MAPHead(nn.Module):
  """Multihead attention pooling. Ref vit.py:163."""
  num_heads: int = 12
  mlp_dim: Optional[int] = None
  dtype_mm: str = "float32"

  @nn.compact
  def __call__(self, x, mask=None):
    probe = self.param("probe", nn.initializers.xavier_uniform(),
                       (1, 1, x.shape[-1]), x.dtype)
    q = jnp.broadcast_to(probe, (x.shape[0], *probe.shape[1:]))
    if mask is not None:  # [B, T] validity -> [B, 1(head), 1(q), T]
      mask = mask[..., None, None, :]
    pooled = MultiHeadAttention(
        num_heads=self.num_heads, dtype_mm=self.dtype_mm, attn_impl="xla",
        name="MultiHeadDotProductAttention_0")(q, x, mask=mask)
    mlp = MlpBlock(mlp_dim=self.mlp_dim, dtype_mm=self.dtype_mm)
    pooled = pooled + mlp(nn.LayerNorm()(pooled))
    return pooled[:, 0]


def prepend_cls(module, x):
  """Adds a learned zero-init [cls] token at position 0 (pool_type="tok")."""
  cls = module.param("cls", nn.initializers.zeros, (1, 1, x.shape[-1]),
                     x.dtype)
  return jnp.concatenate([jnp.tile(cls, [x.shape[0], 1, 1]), x], axis=1)


def classify(module, reps, num_classes, zeroinit):
  """Applies one shared zero-init (by default) linear head to every rep."""
  del module  # heads attach to the module currently compacting
  head_kw = {"kernel_init": nn.initializers.zeros} if zeroinit else {}
  head = nn.Dense(num_classes, name="head", **head_kw)
  return {k: head(v) for k, v in reps.items()}


def readout(x, pool_type, map_head=None):
  """Pools encoded tokens -> (pooled, spatial_tokens).

  Shared by vit, flexi, and the two-tower text towers. `spatial_tokens`
  drops the [cls] slot for "tok" so the 2-D readout stays grid-shaped.
  """
  if pool_type == "map":
    return map_head(x), x
  if pool_type == "gap":
    return jnp.mean(x, axis=1), x
  if pool_type == "0":
    return x[:, 0], x
  if pool_type == "tok":
    return x[:, 0], x[:, 1:]
  if pool_type == "none":
    return x, x
  raise ValueError(f"Unknown pool type: {pool_type!r}")


class _Model(nn.Module):
  """ViT. Ref vit.py:186."""
  num_classes: Optional[int] = None
  # Architecture.
  width: int = 768
  depth: int = 12
  mlp_dim: Optional[int] = None
  num_heads: int = 12
  patch_size: Sequence[int] = (16, 16)
  posemb: str = "learn"  # or "sincos2d"
  # Readout & regularization.
  pool_type: str = "gap"  # gap / map / tok / 0 / none
  rep_size: Union[int, bool] = False
  head_zeroinit: bool = True
  dropout: float = 0.0
  # TPU execution knobs.
  dtype_mm: str = "float32"
  attn_impl: str = "auto"
  scan: bool = False
  remat_policy: str = "nothing_saveable"

  @nn.compact
  def __call__(self, image, *, train=False):
    out = {}

    # Stem: matmul patchify + posemb (+ optional cls token).
    x = out["stem"] = PatchEmbed(
        self.width, self.patch_size, name="embedding",
        dtype_mm=self.dtype_mm)(jnp.asarray(image, self.dtype_mm))
    n, h, w, c = x.shape
    pos = get_posemb(self, self.posemb, (h, w), c, "pos_embedding", x.dtype)
    x = out["with_posemb"] = x.reshape(n, h * w, c) + pos
    if self.pool_type == "tok":
      x = prepend_cls(self, x)
    x = nn.Dropout(rate=self.dropout)(x, not train)

    # Trunk.
    trunk = Encoder(name="Transformer", depth=self.depth,
                    num_heads=self.num_heads, mlp_dim=self.mlp_dim,
                    dropout=self.dropout, attn_impl=self.attn_impl,
                    dtype_mm=self.dtype_mm, scan=self.scan,
                    remat_policy=self.remat_policy)
    x, out["encoder"] = trunk(x, deterministic=not train)
    out["encoded"] = x

    # Readout: pooled vector + 2-D token grid, each through the same
    # (optional) rep projection and classifier head.
    map_head = MAPHead(num_heads=self.num_heads, mlp_dim=self.mlp_dim,
                       dtype_mm=self.dtype_mm) if self.pool_type == "map" \
        else None
    x, encoded = readout(x, self.pool_type, map_head)
    if self.pool_type != "none":
      out["head_input"] = x
    reps = {"": x, "_2d": encoded.reshape(n, h, w, -1)}

    if self.rep_size:
      hid_width = self.width if self.rep_size is True else self.rep_size
      hid = nn.Dense(hid_width, name="pre_logits")
      reps = {k: nn.tanh(hid(v)) for k, v in reps.items()}
    out.update({f"pre_logits{k}": v for k, v in reps.items()})

    if self.num_classes:
      reps = classify(self, reps, self.num_classes, self.head_zeroinit)
      out.update({f"logits{k}": v for k, v in reps.items()})
    return reps[""], out


def Model(num_classes=None, *, variant=None, **kw):  # pylint: disable=invalid-name
  """Factory; linen dataclass fields can't be overridden post-hoc."""
  cfg = decode_variant(variant)
  cfg.update(kw)
  return _Model(num_classes, **cfg)


# (width, depth, mlp_dim, num_heads) per size letter; values are the
# published scaling-law table, arxiv.org/abs/2106.04560 (ref vit.py:228).
VARIANT_TABLE = {
    "mu": (32, 1, 128, 2),
    "Ti": (192, 12, 768, 3),
    "S": (384, 12, 1536, 6),
    "M": (512, 12, 2048, 8),
    "B": (768, 12, 3072, 12),
    "L": (1024, 24, 4096, 16),
    "So400m": (1152, 27, 4304, 16),
    "H": (1280, 32, 5120, 16),
    "g": (1408, 40, 6144, 16),
    "g-opt": (1536, 40, 6144, 16),
    "G": (1664, 48, 8192, 16),
    "G-opt": (1536, 48, 8192, 16),
    "e": (1792, 56, 15360, 16),
}


def decode_variant(variant):
  """"B/16" -> {width, depth, mlp_dim, num_heads, patch_size}."""
  if variant is None:
    return {}
  size, _, patch = variant.partition("/")
  width, depth, mlp_dim, num_heads = VARIANT_TABLE[size]
  cfg = dict(width=width, depth=depth, mlp_dim=mlp_dim, num_heads=num_heads)
  if patch:
    cfg["patch_size"] = (int(patch),) * 2
  return cfg


def resample_posemb(old, new):
  """Bilinear-resizes a learned posemb grid for hi-res finetuning. Ref :306."""
  if old.shape == new.shape:
    return old
  import scipy.ndimage
  side_old, side_new = (int(np.sqrt(p.shape[1])) for p in (old, new))
  zoom = (side_new / side_old, side_new / side_old, 1)
  grid = scipy.ndimage.zoom(old.reshape(side_old, side_old, -1), zoom,
                            order=1)
  return grid.reshape(1, side_new * side_new, -1)


def fix_old_checkpoints(params):
  """Upgrades historical ViT checkpoint layouts to the current tree. Ref :324."""
  import flax
  import flax.training.checkpoints
  params = flax.core.unfreeze(
      flax.training.checkpoints.convert_pre_linen(params))

  # The posemb has lived in two places inside the encoder over the years:
  # its own "posembed_input" module (very old) or directly in "Transformer"
  # (pre-2022). Hoist either to the top level.
  trunk = params.get("Transformer", {})
  if "posembed_input" in trunk:
    params["pos_embedding"] = trunk.pop("posembed_input")["pos_embedding"]
  if "pos_embedding" in trunk:
    params["pos_embedding"] = trunk.pop("pos_embedding")

  # Oldest layout concatenated [cls] before adding posemb, giving N+1
  # posembs; fold the extra slot's posemb into the cls token itself.
  pe = params.get("pos_embedding")
  if pe is not None and int(np.sqrt(pe.shape[1])) ** 2 + 1 == pe.shape[1]:
    params["pos_embedding"] = pe[:, 1:]
    if "cls" in params:
      params["cls"] += pe[:, :1]

  # ViT-G-era checkpoints had the MAP head's submodules inlined at the top.
  if "probe" in params:
    inlined = ("probe", "MlpBlock_0", "MultiHeadDotProductAttention_0",
               "LayerNorm_0")
    params["MAPHead_0"] = {k: params.pop(k) for k in inlined}

  return params


def pyloop_to_scan(params_pyloop):
  """Stacks per-layer encoderblock_{i} subtrees for the scan encoder."""
  params = jax.tree.map(lambda x: x, params_pyloop)
  t = params["Transformer"]
  depth = 1 + max(int(k.split("_")[-1]) for k in t
                  if k.startswith("encoderblock_"))
  t["encoderblock"] = jax.tree.map(
      lambda *xs: np.stack(xs), *[t[f"encoderblock_{i}"] for i in range(depth)])
  for i in range(depth):
    del t[f"encoderblock_{i}"]
  return params


def scan_to_pyloop(params_scan):
  """Inverse of pyloop_to_scan."""
  params = jax.tree.map(lambda x: x, params_scan)
  t = params["Transformer"]
  depth = len(jax.tree.leaves(t["encoderblock"])[0])
  for i in range(depth):
    t[f"encoderblock_{i}"] = jax.tree.map(lambda x, i=i: x[i],
                                          t["encoderblock"])
  del t["encoderblock"]
  return params


def load(init_params, init_file, model_cfg, dont_load=()):  # pylint: disable=invalid-name
  """Loads a ViT checkpoint (any historical layout), with posemb resample."""
  restored = fix_old_checkpoints(
      u.load_params(VANITY_NAMES.get(init_file, init_file)))

  if model_cfg.get("scan") and "encoderblock" not in restored["Transformer"]:
    restored = pyloop_to_scan(restored)
  if not model_cfg.get("scan") and "encoderblock" in restored["Transformer"]:
    restored = scan_to_pyloop(restored)

  restored = common.merge_params(restored, init_params, dont_load)

  if init_params and "pos_embedding" in init_params:
    restored["pos_embedding"] = resample_posemb(
        old=restored["pos_embedding"], new=init_params["pos_embedding"])
  return restored


# Canonical public checkpoints (same mapping as the reference so configs
# using these names keep working; all on public GCS buckets).
VANITY_NAMES = {
    "howto-i21k-Ti/16": "gs://vit_models/augreg/Ti_16-i21k-300ep-lr_0.001-aug_none-wd_0.03-do_0.0-sd_0.0.npz",
    "howto-i21k-S/32": "gs://vit_models/augreg/S_32-i21k-300ep-lr_0.001-aug_none-wd_0.1-do_0.0-sd_0.0.npz",
    "howto-i21k-S/16": "gs://vit_models/augreg/S_16-i21k-300ep-lr_0.001-aug_light1-wd_0.03-do_0.0-sd_0.0.npz",
    "howto-i21k-B/32": "gs://vit_models/augreg/B_32-i21k-300ep-lr_0.001-aug_light1-wd_0.1-do_0.0-sd_0.0.npz",
    "howto-i21k-B/16": "gs://vit_models/augreg/B_16-i21k-300ep-lr_0.001-aug_medium1-wd_0.1-do_0.0-sd_0.0.npz",
    "howto-i21k-B/8": "gs://vit_models/augreg/B_8-i21k-300ep-lr_0.001-aug_medium2-wd_0.1-do_0.0-sd_0.0.npz",
    "howto-i21k-L/16": "gs://vit_models/augreg/L_16-i21k-300ep-lr_0.001-aug_strong1-wd_0.1-do_0.0-sd_0.0.npz",
    "i1k-s16-90ep": "gs://big_vision/vit_s16_i1k_90ep.npz",
    "i1k-s16-150ep": "gs://big_vision/vit_s16_i1k_150ep.npz",
    "i1k-s16-300ep": "gs://big_vision/vit_s16_i1k_300ep.npz",
    "SigLIP B/16 224": "gs://big_vision/siglip/webli_en_b16_224_63724782.npz:img",
    "SigLIP B/16 256": "gs://big_vision/siglip/webli_en_b16_256_60500360.npz:img",
    "SigLIP B/16 384": "gs://big_vision/siglip/webli_en_b16_384_68578854.npz:img",
    "SigLIP L/16 256": "gs://big_vision/siglip/webli_en_l16_256_60552751.npz:img",
    "SigLIP L/16 384": "gs://big_vision/siglip/webli_en_l16_384_63634585.npz:img",
    "SigLIP So400m/14 224": "gs://big_vision/siglip/webli_en_so400m_224_57633886.npz:img",
    "SigLIP So400m/14 384": "gs://big_vision/siglip/webli_en_so400m_384_58765454.npz:img",
    "SigLIP2 B/16 224": "gs://big_vision/siglip2/siglip2_b16_224.npz:img",
    "SigLIP2 B/16 256": "gs://big_vision/siglip2/siglip2_b16_256.npz:img",
    "SigLIP2 L/16 256": "gs://big_vision/siglip2/siglip2_l16_256.npz:img",
    "SigLIP2 So400m/14 224": "gs://big_vision/siglip2/siglip2_so400m14_224.npz:img",
}
