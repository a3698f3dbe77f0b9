"""NaFlex ViT: variable aspect/resolution patch sequences (SigLIP-2).

Parity target: reference models/proj/image_text/naflex_vit.py: input is a
tuple (patches [B,N,phw*3], ptype [B,N], yidx [B,N], xidx [B,N]) from the
NaFlex pp ops; learned 2D posemb is resized per example to the image's
patch grid and gathered at each patch's coordinates; attention and pooling
mask out padding tokens.
"""

from __future__ import annotations

import re
from typing import Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from big_vision_tpu.models import vit


def _decode_posemb(posemb):
  if m := re.fullmatch(r"learn_2d(\(\d+\))", posemb):
    return "learn_2d", int(m.groups()[0][1:-1])
  return posemb, None


def _pos_emb_resize(pos_emb, shapes, coords, l):
  """Per-example bilinear resize of the posemb grid + coordinate gather.

  `l` bounds the per-side patch count (static shape for the scaled grid);
  resolutions beyond l*patch_size would NaN — raise `l` post-hoc if needed.
  """
  def resize_fn(shape, coords):
    emb = jax.image.scale_and_translate(
        pos_emb, shape=(l, l, pos_emb.shape[-1]), spatial_dims=(0, 1),
        scale=shape / jnp.asarray(pos_emb.shape[:2]),
        translation=jnp.asarray([0.0, 0.0]),
        method="bilinear", antialias=True)
    gather_dim = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0, 1),
        start_index_map=(0, 1, 2))
    return jax.lax.gather(
        emb, jnp.pad(coords, [[0, 0], [0, 1]]), gather_dim,
        [1, 1, emb.shape[-1]], mode="fill")
  return jax.vmap(resize_fn)(shapes, coords)


class Encoder1DBlock(nn.Module):
  """ViT block with an attention mask (padding tokens can't attend)."""
  attn_impl: str = "xla"
  mlp_dim: Optional[int] = None
  num_heads: int = 12
  dropout: float = 0.0
  dtype_mm: str = "float32"

  @nn.compact
  def __call__(self, x, mask=None, deterministic=True, seg=None):
    out = {}
    y = nn.LayerNorm()(x)
    use_seg = self.attn_impl == "flash" and seg is not None
    y = out["sa"] = vit.MultiHeadAttention(
        num_heads=self.num_heads, dtype_mm=self.dtype_mm,
        attn_impl=self.attn_impl,
        name="MultiHeadDotProductAttention_0")(
            y, y,
            mask=(None if use_seg else
                  mask[..., None, :, :] if mask is not None else None),
            seg=seg if use_seg else None)
    y = nn.Dropout(rate=self.dropout)(y, deterministic)
    x = out["+sa"] = x + y
    y = nn.LayerNorm()(x)
    y = out["mlp"] = vit.MlpBlock(
        mlp_dim=self.mlp_dim, dropout=self.dropout,
        dtype_mm=self.dtype_mm)(y, deterministic)
    y = nn.Dropout(rate=self.dropout)(y, deterministic)
    x = out["+mlp"] = x + y
    return x, out


class Encoder(nn.Module):
  depth: int
  mlp_dim: Optional[int] = None
  num_heads: int = 12
  dropout: float = 0.0
  scan: bool = False
  remat_policy: str = "nothing_saveable"
  dtype_mm: str = "float32"
  attn_impl: str = "xla"

  @nn.compact
  def __call__(self, x, mask=None, deterministic=True, seg=None):
    out = {}
    block_kw = dict(mlp_dim=self.mlp_dim, num_heads=self.num_heads,
                    dropout=self.dropout, dtype_mm=self.dtype_mm,
                    attn_impl=self.attn_impl)
    if self.scan:
      block = nn.remat(Encoder1DBlock, prevent_cse=False,
                       static_argnums=(3,),
                       policy=getattr(jax.checkpoint_policies,
                                      self.remat_policy, None))
      x, scan_out = nn.scan(
          block, variable_axes={"params": 0},
          split_rngs={"params": True, "dropout": True},
          in_axes=nn.broadcast, length=self.depth)(
              name="encoderblock", **block_kw)(x, mask, deterministic,
                                               seg)
      for lyr in range(self.depth):
        out[f"block{lyr:02d}"] = jax.tree.map(lambda o, l=lyr: o[l],
                                              scan_out)
    else:
      for lyr in range(self.depth):
        x, out[f"block{lyr:02d}"] = Encoder1DBlock(
            name=f"encoderblock_{lyr}", **block_kw)(x, mask,
                                                    deterministic, seg)
      out["pre_ln"] = x
    return nn.LayerNorm(name="encoder_norm")(x), out


class MAPHead(nn.Module):
  mlp_dim: Optional[int] = None
  num_heads: int = 12

  @nn.compact
  def __call__(self, x, mask=None):
    n, _, d = x.shape
    probe = self.param("probe", nn.initializers.xavier_uniform(),
                       (1, 1, d), x.dtype)
    probe = jnp.tile(probe, [n, 1, 1])
    if mask is not None:
      mask = mask[..., None, None, :]
    x = vit.MultiHeadAttention(
        num_heads=self.num_heads, attn_impl="xla",
        name="MultiHeadDotProductAttention_0")(probe, x, mask=mask)
    y = nn.LayerNorm()(x)
    x = x + vit.MlpBlock(mlp_dim=self.mlp_dim)(y)
    return x[:, 0]


class _Model(nn.Module):
  """NaFlex ViT over (patches, type, yidx, xidx) tuples."""
  num_classes: Optional[int] = None
  width: int = 768
  depth: int = 12
  mlp_dim: Optional[int] = None
  num_heads: int = 12
  rep_size: Union[int, bool] = False
  pool_type: str = "gap"  # map / gap / max / none
  head_zeroinit: bool = True
  scan: bool = False
  remat_policy: str = "nothing_saveable"
  dtype_mm: str = "float32"
  posemb: str = "learn_2d(64)"
  nposemb: Optional[int] = None
  patchln_pre: bool = False
  patchln_post: bool = False
  attn_impl: str = "xla"

  @nn.compact
  def __call__(self, image, *, train=False):
    out = {}
    patches, ptype, yabs, xabs = image
    patches = jnp.asarray(patches, self.dtype_mm)

    if self.patchln_pre:
      patches = nn.LayerNorm(name="patchln_pre")(patches)
    tokens = out["stem"] = nn.Dense(
        self.width, name="embedding", dtype=self.dtype_mm)(patches)
    if self.patchln_post:
      tokens = nn.LayerNorm(name="patchln_post")(tokens)

    x = tokens
    posemb, grid = _decode_posemb(self.posemb)
    if posemb == "learn_2d":
      posembs = self.param(
          "pos_embedding",
          nn.initializers.normal(stddev=1 / np.sqrt(self.width)),
          (self.nposemb, self.nposemb, self.width), self.dtype_mm)
      coords = jnp.stack([yabs, xabs], axis=-1)
      shapes = coords.max(axis=1) + 1
      x += _pos_emb_resize(posembs, shapes, coords, grid or 64)
    else:
      raise ValueError(f"Unknown posemb {self.posemb!r}")
    out["with_posemb"] = x

    from big_vision_tpu.ops import flash_attention as _fa
    if (self.attn_impl == "flash"
        and patches.shape[1] <= _fa.MAX_ONESHOT):
      # Padding-only masking == segment ids 1 (valid) / 0 (pad): the
      # fused kernel consumes this directly (no [T, T] bool mask).
      sa_mask, seg = None, (ptype == 1).astype(jnp.int32)
    else:
      seg = None
      sa_mask = ptype == 1
      sa_mask = jnp.logical_and(sa_mask[..., :, None],
                                sa_mask[..., None, :])
    x, out["encoder"] = Encoder(
        depth=self.depth, mlp_dim=self.mlp_dim, num_heads=self.num_heads,
        scan=self.scan, remat_policy=self.remat_policy,
        dtype_mm=self.dtype_mm, attn_impl=self.attn_impl,
        name="Transformer")(
            x, mask=sa_mask, deterministic=not train, seg=seg)
    out["encoded"] = x

    pool_mask = ptype == 1
    if self.pool_type == "map":
      x = MAPHead(num_heads=self.num_heads, mlp_dim=self.mlp_dim)(
          x, mask=pool_mask)
    elif self.pool_type == "gap":
      pm = pool_mask[..., None]
      x = jnp.sum(x * pm, axis=1) / jnp.sum(pm, axis=1)
    elif self.pool_type == "max":
      pm = pool_mask[..., None]
      ignore = jnp.where(pm, 0, jnp.finfo(x.dtype).min)
      x = jnp.max(pm * x + ignore, axis=1)
    elif self.pool_type == "none":
      pass
    else:
      raise ValueError(f"Unknown pool type {self.pool_type!r}")
    out["head_input"] = x

    if self.rep_size:
      rep_size = self.width if self.rep_size is True else self.rep_size
      x = nn.tanh(nn.Dense(rep_size, name="pre_logits")(x))
    out["pre_logits"] = x

    if self.num_classes:
      kw = ({"kernel_init": nn.initializers.zeros}
            if self.head_zeroinit else {})
      x = out["logits"] = nn.Dense(self.num_classes, name="head", **kw)(x)
    return x, out


def Model(num_classes=None, *, variant=None, **kw):  # pylint: disable=invalid-name
  cfg = {**vit.decode_variant(variant), **kw}
  cfg.pop("patch_size", None)  # patching happens in pp
  return _Model(num_classes, **cfg)


load = vit.load
