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
  """2D sin-cos position embedding (MoCo-v3 style). Ref vit.py:34."""
  y, x = jnp.mgrid[:h, :w]
  assert width % 4 == 0, "Width must be a multiple of 4 for sincos posemb"
  omega = jnp.arange(width // 4) / (width // 4 - 1)
  omega = 1. / (temperature ** omega)
  y = jnp.einsum("m,d->md", y.flatten(), omega)
  x = jnp.einsum("m,d->md", x.flatten(), omega)
  pe = jnp.concatenate([jnp.sin(x), jnp.cos(x), jnp.sin(y), jnp.cos(y)], 1)
  return jnp.asarray(pe, dtype)[None]


def get_posemb(module, typ, seqshape, width, name, dtype=jnp.float32):
  if typ == "learn":
    return module.param(
        name, nn.initializers.normal(stddev=1 / np.sqrt(width)),
        (1, int(np.prod(seqshape)), width), dtype)
  if typ == "sincos2d":
    return posemb_sincos_2d(*seqshape, width, dtype=dtype)
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
  dropout: float = 0.0
  dtype_mm: str = "float32"

  @nn.compact
  def __call__(self, x, deterministic=True):
    inits = dict(kernel_init=nn.initializers.xavier_uniform(),
                 bias_init=nn.initializers.normal(stddev=1e-6))
    d = x.shape[-1]
    x = nn.Dense(self.mlp_dim or 4 * d, dtype=self.dtype_mm, **inits)(x)
    x = _constrain(x)
    x = nn.gelu(x)
    x = nn.Dropout(rate=self.dropout)(x, deterministic)
    x = nn.Dense(d, dtype=self.dtype_mm, **inits)(x)
    return x


class Encoder1DBlock(nn.Module):
  """Pre-norm transformer block. Ref vit.py:81."""
  mlp_dim: Optional[int] = None
  num_heads: int = 12
  dropout: float = 0.0
  dtype_mm: str = "float32"
  attn_impl: str = "auto"

  @nn.compact
  def __call__(self, x, deterministic=True):
    out = {}
    x = _constrain(x)
    # dtype=dtype_mm keeps the residual stream in bf16: the default f32
    # LayerNorm output promotes every residual add (and all inter-block
    # HBM traffic) to f32 — measured 50 ms of pure LN time per B/16 step.
    # Stats still accumulate in f32 inside flax's _compute_stats.
    y = nn.LayerNorm(dtype=self.dtype_mm)(x)
    y = out["sa"] = MultiHeadAttention(
        num_heads=self.num_heads, dtype_mm=self.dtype_mm,
        attn_impl=self.attn_impl,
        name="MultiHeadDotProductAttention_0")(y, y,
                                               deterministic=deterministic)
    y = _constrain(y)
    y = nn.Dropout(rate=self.dropout)(y, deterministic)
    x = out["+sa"] = x + y

    y = nn.LayerNorm(dtype=self.dtype_mm)(x)
    y = out["mlp"] = MlpBlock(
        mlp_dim=self.mlp_dim, dropout=self.dropout, dtype_mm=self.dtype_mm,
    )(y, deterministic)
    y = _constrain(y)
    y = nn.Dropout(rate=self.dropout)(y, deterministic)
    x = out["+mlp"] = x + y
    return _constrain(x), out


class Encoder(nn.Module):
  """Stack of blocks; lax.scan-over-layers + remat when `scan`. Ref :115."""
  depth: int
  mlp_dim: Optional[int] = None
  num_heads: int = 12
  dropout: float = 0.0
  scan: bool = False
  remat_policy: str = "nothing_saveable"
  dtype_mm: str = "float32"
  attn_impl: str = "auto"

  @nn.compact
  def __call__(self, x, deterministic=True):
    out = {}
    block_kw = dict(dtype_mm=self.dtype_mm, mlp_dim=self.mlp_dim,
                    num_heads=self.num_heads, dropout=self.dropout,
                    attn_impl=self.attn_impl)
    if self.scan:
      block = nn.remat(
          Encoder1DBlock,
          prevent_cse=False,
          static_argnums=(2,),  # 0=self, 2=deterministic
          policy=getattr(jax.checkpoint_policies, self.remat_policy, None))
      x, scan_out = nn.scan(
          block,
          variable_axes={"params": 0},
          split_rngs={"params": True, "dropout": True},
          in_axes=nn.broadcast,
          length=self.depth)(name="encoderblock", **block_kw)(
              x, deterministic)
      for lyr in range(self.depth):
        out[f"block{lyr:02d}"] = jax.tree.map(lambda o, l=lyr: o[l], scan_out)
    else:
      for lyr in range(self.depth):
        x, out[f"block{lyr:02d}"] = Encoder1DBlock(
            name=f"encoderblock_{lyr}", **block_kw)(x, deterministic)
      out["pre_ln"] = x
    return nn.LayerNorm(name="encoder_norm")(x), out


class MAPHead(nn.Module):
  """Multihead attention pooling. Ref vit.py:163."""
  mlp_dim: Optional[int] = None
  num_heads: int = 12
  dtype_mm: str = "float32"

  @nn.compact
  def __call__(self, x):
    n, _, d = x.shape
    probe = self.param("probe", nn.initializers.xavier_uniform(),
                       (1, 1, d), x.dtype)
    probe = jnp.tile(probe, [n, 1, 1])
    x = MultiHeadAttention(
        num_heads=self.num_heads, dtype_mm=self.dtype_mm, attn_impl="xla",
        name="MultiHeadDotProductAttention_0")(probe, x)
    y = nn.LayerNorm()(x)
    x = x + MlpBlock(mlp_dim=self.mlp_dim, dtype_mm=self.dtype_mm)(y)
    return x[:, 0]


class _Model(nn.Module):
  """ViT. Ref vit.py:186."""
  num_classes: Optional[int] = None
  patch_size: Sequence[int] = (16, 16)
  width: int = 768
  depth: int = 12
  mlp_dim: Optional[int] = None
  num_heads: int = 12
  posemb: str = "learn"  # or "sincos2d"
  rep_size: Union[int, bool] = False
  dropout: float = 0.0
  pool_type: str = "gap"  # gap / map / tok / 0 / none
  head_zeroinit: bool = True
  scan: bool = False
  remat_policy: str = "nothing_saveable"
  dtype_mm: str = "float32"
  attn_impl: str = "auto"

  @nn.compact
  def __call__(self, image, *, train=False):
    out = {}
    image = jnp.asarray(image, self.dtype_mm)

    x = out["stem"] = PatchEmbed(
        self.width, self.patch_size, name="embedding",
        dtype_mm=self.dtype_mm)(image)
    n, h, w, c = x.shape
    x = jnp.reshape(x, [n, h * w, c])

    x = out["with_posemb"] = x + get_posemb(
        self, self.posemb, (h, w), c, "pos_embedding", x.dtype)

    if self.pool_type == "tok":
      cls = self.param("cls", nn.initializers.zeros, (1, 1, c), x.dtype)
      x = jnp.concatenate([jnp.tile(cls, [n, 1, 1]), x], axis=1)

    x = nn.Dropout(rate=self.dropout)(x, not train)

    x, out["encoder"] = Encoder(
        depth=self.depth, mlp_dim=self.mlp_dim, num_heads=self.num_heads,
        dropout=self.dropout, scan=self.scan, remat_policy=self.remat_policy,
        dtype_mm=self.dtype_mm, attn_impl=self.attn_impl,
        name="Transformer")(x, deterministic=not train)
    encoded = out["encoded"] = x

    if self.pool_type == "map":
      x = out["head_input"] = MAPHead(
          num_heads=self.num_heads, mlp_dim=self.mlp_dim,
          dtype_mm=self.dtype_mm)(x)
    elif self.pool_type == "gap":
      x = out["head_input"] = jnp.mean(x, axis=1)
    elif self.pool_type == "0":
      x = out["head_input"] = x[:, 0]
    elif self.pool_type == "tok":
      x = out["head_input"] = x[:, 0]
      encoded = encoded[:, 1:]
    elif self.pool_type == "none":
      pass
    else:
      raise ValueError(f"Unknown pool type: {self.pool_type!r}")

    x_2d = jnp.reshape(encoded, [n, h, w, -1])

    if self.rep_size:
      rep_size = self.width if self.rep_size is True else self.rep_size
      hid = nn.Dense(rep_size, name="pre_logits")
      x_2d = nn.tanh(hid(x_2d))
      x = nn.tanh(hid(x))

    out["pre_logits_2d"] = x_2d
    out["pre_logits"] = x

    if self.num_classes:
      kw = {"kernel_init": nn.initializers.zeros} if self.head_zeroinit else {}
      head = nn.Dense(self.num_classes, name="head", **kw)
      x_2d = out["logits_2d"] = head(x_2d)
      x = out["logits"] = head(x)

    return x, out


def Model(num_classes=None, *, variant=None, **kw):  # pylint: disable=invalid-name
  """Factory; linen dataclass fields can't be overridden post-hoc."""
  return _Model(num_classes, **{**decode_variant(variant), **kw})


def decode_variant(variant):
  """"B/16" -> config dict. Table from arxiv.org/abs/2106.04560."""
  if variant is None:
    return {}
  v, patch = variant, {}
  if "/" in variant:
    v, patch = variant.split("/")
    patch = {"patch_size": (int(patch), int(patch))}
  width = {"mu": 32, "Ti": 192, "S": 384, "M": 512, "B": 768, "L": 1024,
           "So400m": 1152, "H": 1280, "g": 1408, "g-opt": 1536, "G": 1664,
           "G-opt": 1536, "e": 1792}
  depth = {"mu": 1, "Ti": 12, "S": 12, "M": 12, "B": 12, "L": 24,
           "So400m": 27, "H": 32, "g": 40, "g-opt": 40, "G": 48, "G-opt": 48,
           "e": 56}
  mlp = {"mu": 128, "Ti": 768, "S": 1536, "M": 2048, "B": 3072, "L": 4096,
         "So400m": 4304, "H": 5120, "g": 6144, "g-opt": 6144, "G": 8192,
         "G-opt": 8192, "e": 15360}
  heads = {"mu": 2, "Ti": 3, "S": 6, "M": 8, "B": 12, "L": 16, "So400m": 16,
           "H": 16, "g": 16, "g-opt": 16, "G": 16, "G-opt": 16, "e": 16}
  return {"width": width[v], "depth": depth[v], "mlp_dim": mlp[v],
          "num_heads": heads[v], **patch}


def resample_posemb(old, new):
  """Bilinear-resizes a learned posemb grid for hi-res finetuning. Ref :306."""
  if old.shape == new.shape:
    return old
  import scipy.ndimage
  gs_old = int(np.sqrt(old.shape[1]))
  gs_new = int(np.sqrt(new.shape[1]))
  grid = old.reshape(gs_old, gs_old, -1)
  grid = scipy.ndimage.zoom(grid, (gs_new / gs_old, gs_new / gs_old, 1),
                            order=1)
  return grid.reshape(1, gs_new * gs_new, -1)


def fix_old_checkpoints(params):
  """Upgrades historical ViT checkpoint layouts to the current tree. Ref :324."""
  import flax
  import flax.training.checkpoints
  params = flax.core.unfreeze(
      flax.training.checkpoints.convert_pre_linen(params))

  if "posembed_input" in params.get("Transformer", {}):
    # Very old: posemb lived in its own module.
    posemb = params["Transformer"].pop("posembed_input")
    params["pos_embedding"] = posemb["pos_embedding"]

  if "pos_embedding" in params.get("Transformer", {}):
    # Pre-2022: posemb lived in the Encoder.
    params["pos_embedding"] = params["Transformer"].pop("pos_embedding")

  if "pos_embedding" in params:
    # Oldest layout concatenated [cls] before adding posemb, giving N+1
    # posembs; fold the cls posemb into the cls token.
    pe = params["pos_embedding"]
    if int(np.sqrt(pe.shape[1])) ** 2 + 1 == int(pe.shape[1]):
      pe_cls, params["pos_embedding"] = pe[:, :1], pe[:, 1:]
      if "cls" in params:
        params["cls"] += pe_cls

  if "probe" in params:
    # ViT-G-era checkpoints had the MAP head inlined.
    params["MAPHead_0"] = {
        k: params.pop(k) for k in
        ["probe", "MlpBlock_0", "MultiHeadDotProductAttention_0",
         "LayerNorm_0"]}

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
  init_file = VANITY_NAMES.get(init_file, init_file)
  restored = u.load_params(init_file)
  restored = fix_old_checkpoints(restored)

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
