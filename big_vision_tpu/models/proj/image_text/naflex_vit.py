"""NaFlex ViT: variable aspect/resolution patch sequences (SigLIP-2).

Parity target: reference models/proj/image_text/naflex_vit.py: input is a
tuple (patches [B,N,phw*3], ptype [B,N], yidx [B,N], xidx [B,N]) from the
NaFlex pp ops; a learned 2D posemb is bilinearly rescaled per example to
that example's patch grid and gathered at each patch's (y, x) coordinate;
attention and pooling mask out padding tokens (ptype != 1).

The trunk is models/vit.py's Encoder/MAPHead (which take the padding mask
or, for the fused flash kernel, segment ids), so this file only owns the
NaFlex-specific stem: linear patch embedding with optional pre/post LN and
the per-example posemb resample.
"""

from __future__ import annotations

import re
from typing import Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from big_vision_tpu.models import vit
from big_vision_tpu.ops import flash_attention as fa


def _decode_posemb(posemb):
  m = re.fullmatch(r"learn_2d\((\d+)\)", posemb)
  if m is None:
    return posemb, None
  return "learn_2d", int(m.group(1))


# Gather spec picking one posemb row per (y, x) patch coordinate.
_COORD_GATHER = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0, 1),
    start_index_map=(0, 1, 2))


def _pos_emb_resize(pos_emb, shapes, coords, l):
  """Per-example bilinear resize of the posemb grid + coordinate gather.

  `l` bounds the per-side patch count (static shape for the scaled grid);
  resolutions beyond l*patch_size would NaN — raise `l` post-hoc if needed.
  """
  width = pos_emb.shape[-1]
  canon_hw = jnp.asarray(pos_emb.shape[:2])

  def resize_fn(shape, coords):
    emb = jax.image.scale_and_translate(
        pos_emb, shape=(l, l, width), spatial_dims=(0, 1),
        scale=shape / canon_hw, translation=jnp.zeros(2),
        method="bilinear", antialias=True)
    idx = jnp.pad(coords, [[0, 0], [0, 1]])
    return jax.lax.gather(emb, idx, _COORD_GATHER, [1, 1, width],
                          mode="fill")

  return jax.vmap(resize_fn)(shapes, coords)


def masked_pool(x, keep, pool_type):
  """Pools [B, T, D] over valid (keep) tokens only."""
  keep = keep[..., None]
  if pool_type == "gap":
    return jnp.sum(x * keep, axis=1) / jnp.sum(keep, axis=1)
  if pool_type == "max":
    neg = jnp.where(keep, 0, jnp.finfo(x.dtype).min)
    return jnp.max(x * keep + neg, axis=1)
  raise ValueError(f"Unknown pool type {pool_type!r}")


class _Model(nn.Module):
  """NaFlex ViT over (patches, type, yidx, xidx) tuples."""
  num_classes: Optional[int] = None
  width: int = 768
  depth: int = 12
  mlp_dim: Optional[int] = None
  num_heads: int = 12
  pool_type: str = "gap"  # map / gap / max / none
  rep_size: Union[int, bool] = False
  head_zeroinit: bool = True
  # NaFlex stem.
  posemb: str = "learn_2d(64)"
  nposemb: Optional[int] = None
  patchln_pre: bool = False
  patchln_post: bool = False
  # TPU execution knobs.
  dtype_mm: str = "float32"
  attn_impl: str = "xla"
  scan: bool = False
  remat_policy: str = "nothing_saveable"

  @nn.compact
  def __call__(self, image, *, train=False):
    out = {}
    patches, ptype, yabs, xabs = image
    valid = ptype == 1

    # Stem: linear patch embedding (pp already did the patchify).
    patches = jnp.asarray(patches, self.dtype_mm)
    if self.patchln_pre:
      patches = nn.LayerNorm(name="patchln_pre")(patches)
    stem = nn.Dense(self.width, name="embedding", dtype=self.dtype_mm)
    x = out["stem"] = stem(patches)
    if self.patchln_post:
      x = nn.LayerNorm(name="patchln_post")(x)

    # Posemb: rescale the canonical grid to each example's own grid, then
    # pick the embedding under every patch's coordinate.
    kind, grid = _decode_posemb(self.posemb)
    if kind != "learn_2d":
      raise ValueError(f"Unknown posemb {self.posemb!r}")
    table_shape = (self.nposemb, self.nposemb, self.width)
    table = self.param("pos_embedding",
                       nn.initializers.normal(stddev=self.width ** -0.5),
                       table_shape, self.dtype_mm)
    coords = jnp.stack([yabs, xabs], axis=-1)
    grids_hw = coords.max(axis=1) + 1
    x += _pos_emb_resize(table, grids_hw, coords, grid or 64)
    out["with_posemb"] = x

    # Padding-only masking == segment ids (1 valid / 0 pad) for the fused
    # flash kernel; the [B, T, T] bool mask otherwise.
    if self.attn_impl == "flash" and patches.shape[1] <= fa.MAX_ONESHOT:
      sa_mask, seg = None, valid.astype(jnp.int32)
    else:
      sa_mask, seg = valid[..., :, None] & valid[..., None, :], None

    trunk = vit.Encoder(name="Transformer", depth=self.depth,
                        num_heads=self.num_heads, mlp_dim=self.mlp_dim,
                        attn_impl=self.attn_impl, dtype_mm=self.dtype_mm,
                        scan=self.scan, remat_policy=self.remat_policy)
    x, out["encoder"] = trunk(x, deterministic=not train, mask=sa_mask,
                              seg=seg)
    out["encoded"] = x

    if self.pool_type == "map":
      x = vit.MAPHead(num_heads=self.num_heads,
                      mlp_dim=self.mlp_dim)(x, mask=valid)
    elif self.pool_type != "none":
      x = masked_pool(x, valid, self.pool_type)
    out["head_input"] = x

    if self.rep_size:
      hid_width = self.width if self.rep_size is True else self.rep_size
      x = nn.tanh(nn.Dense(hid_width, name="pre_logits")(x))
    out["pre_logits"] = x

    if self.num_classes:
      reps = vit.classify(self, {"": x}, self.num_classes,
                          self.head_zeroinit)
      x = out["logits"] = reps[""]
    return x, out


def Model(num_classes=None, *, variant=None, **kw):  # pylint: disable=invalid-name
  cfg = dict(vit.decode_variant(variant))
  cfg.update(kw)
  cfg.pop("patch_size", None)  # patching happens in pp
  return _Model(num_classes, **cfg)


load = vit.load
