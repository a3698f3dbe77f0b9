"""FlexiViT: ViT with a runtime-selectable patch size.

Parity target: reference models/proj/flexi/vit.py (PI-resize of the patch
kernel `resample_patchemb` :30, Patchify :78, posemb resize, _Model :110).
The PI-resize inverts patch resizing: a B/8 kernel loaded into a B/16 model
on a 2x image matches. The 1-D linear-resize operator is built analytically
in numpy (triangle kernel, antialiased) instead of probing tf.image.resize
with basis vectors; the two agree because both implement half-pixel-centered
bilinear sampling.

The body is the TPU-first ViT trunk from models/vit.py (flash-capable
attention, scan/remat, bf16 residual stream) — only the stem (runtime
kernel resample) and the seqhw-dependent posemb interpolation differ.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp  # noqa: F401  (kept: device-pp callers patch through)
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.models import common, vit

# Published FlexiViT checkpoints, keyed by vanity name.
_CKPT_DIR = "gs://big_vision/flexivit"
VANITY_NAMES = {
    vanity: f"{_CKPT_DIR}/{fname}.npz" for vanity, fname in (
        ("FlexiViT-L i1k", "flexivit_l_i1k"),
        ("FlexiViT-B i1k", "flexivit_b_i1k"),
        ("FlexiViT-S i1k", "flexivit_s_i1k"),
        ("FlexiViT-B i21k 90ep", "flexivit_b_i21k_90ep"),
        ("FlexiViT-B i21k 300ep", "flexivit_b_i21k_300ep"),
        ("FlexiViT-B i21k 1000ep", "flexivit_b_i21k_1000ep"),
        ("ViT-B/16 i21k", "vit_b16_i21k_300ep"),
        ("ViT-B/30 i21k", "vit_b30_i21k_300ep"),
    )
}


def _linear_resize_mat_1d(n_in, n_out):
  """[n_out, n_in] matrix of jax.image.resize(method="linear").

  Triangle kernel over half-pixel-centered coordinates, widened by the
  scale factor when downsampling (antialias), weights normalized — pure
  numpy so it is computable at trace time (constants are traced too in
  recent jax, so building it via jax.image.resize inside jit fails).
  """
  scale = n_out / n_in
  # Input-space sample position of each output pixel.
  x = (np.arange(n_out, dtype=np.float64) + 0.5) / scale - 0.5
  s = max(1.0, 1.0 / scale)  # kernel width (antialias on downsample)
  j = np.arange(n_in, dtype=np.float64)
  w = np.maximum(0.0, 1.0 - np.abs(x[:, None] - j[None, :]) / s)
  return (w / w.sum(axis=1, keepdims=True)).astype(np.float32)


def resample_patchemb(old, new_hw):
  """PI-resize of a patch-embedding kernel [h, w, c_in, width].

  Pseudo-inverse of the transposed patch-resize operator, chosen so that
  `resampled_kernel . resized_patch ~= kernel . patch` (ref vit.py:45).
  The 2-D resize operator is the Kronecker product of the two 1-D ones
  (separable bilinear), acting on flattened h*w kernels.
  """
  if old.ndim != 4:
    raise ValueError(f"patch kernel must be [h,w,cin,width], got {old.shape}")
  new_hw = tuple(new_hw)
  if len(new_hw) != 2:
    raise ValueError(f"target must be (h, w), got {new_hw}")
  if new_hw == tuple(old.shape[:2]):
    return old

  # [prod(new), prod(old)], columns = resized basis kernels (the 2-D resize
  # is separable, i.e. the Kronecker product of the two 1-D operators).
  op = np.kron(_linear_resize_mat_1d(old.shape[0], new_hw[0]),
               _linear_resize_mat_1d(old.shape[1], new_hw[1]))
  pinv = np.linalg.pinv(op.T)

  per_plane = lambda k: (pinv @ k.reshape(-1)).reshape(new_hw)
  # vmap over c_in and width planes.
  return jax.vmap(jax.vmap(per_plane, 2, 2), 3, 3)(old)


class Patchify(nn.Module):
  """Patch embedding whose kernel is PI-resized per requested seqhw."""
  width: int = 768
  patch_size: Sequence[int] = (32, 32)
  seqhw: Optional[int] = None

  def _grid_to_patch(self, image_hw, seqhw):
    """Patch size that tiles image_hw into a seqhw x seqhw token grid."""
    seqhw = seqhw or self.seqhw
    if seqhw is None and self.is_initializing():
      return tuple(self.patch_size)
    return tuple(side // seqhw for side in image_hw)

  @nn.compact
  def __call__(self, image, seqhw=None):
    stored = tuple(self.patch_size)
    kernel = self.param(
        "kernel", nn.initializers.normal(stddev=self.width ** -0.5),
        stored + (image.shape[-1], self.width), image.dtype)
    bias = self.param("bias", nn.initializers.zeros, self.width,
                      image.dtype)

    patch = self._grid_to_patch(image.shape[1:3], seqhw)
    if patch != stored:
      kernel = resample_patchemb(old=kernel, new_hw=patch)

    dn = ("NHWC", "HWIO", "NHWC")
    return bias + jax.lax.conv_general_dilated(
        image, kernel, window_strides=patch, padding="VALID",
        dimension_numbers=dn)


class _Model(nn.Module):
  """FlexiViT."""
  num_classes: int
  # Trunk/readout first, then the flexi-specific stem knobs.
  depth: int = 12
  width: int = 768
  num_heads: int = 12
  mlp_dim: Optional[int] = None
  pool_type: str = "gap"
  head_zeroinit: bool = True
  dtype_mm: str = "float32"
  posemb: str = "learn"
  # Stem: the stored kernel's patch size, the canonical posemb grid, and
  # the default token-grid side (None = native patch size).
  patch_size: Sequence[int] = (32, 32)
  posemb_size: Sequence[int] = (7, 7)
  seqhw: Optional[int] = None

  def _tokens_with_posemb(self, image, seqhw, out):
    """Stem: patchify at the requested grid + resized posemb."""
    stem = Patchify(width=self.width, patch_size=tuple(self.patch_size),
                    seqhw=self.seqhw, name="embedding")
    grid = out["stem"] = stem(image, seqhw)
    n, h, w, c = grid.shape

    # The canonical posemb lives on a fixed posemb_size grid and is
    # bilinearly interpolated to whatever grid this seqhw produced.
    pos = vit.get_posemb(self, self.posemb, tuple(self.posemb_size), c,
                         "pos_embedding", grid.dtype)
    if pos.shape[1] != h * w:
      canon = pos.reshape(1, *self.posemb_size, c)
      pos = jax.image.resize(canon, (1, h, w, c), "linear").reshape(
          1, h * w, c)
    out["with_posemb"] = grid.reshape(n, h * w, c) + pos
    return out["with_posemb"], (n, h, w)

  @nn.compact
  def __call__(self, image, *, seqhw=None, train=False):
    out = {}
    x, (n, h, w) = self._tokens_with_posemb(image, seqhw, out)

    if self.pool_type == "tok":
      x = vit.prepend_cls(self, x)

    trunk = vit.Encoder(depth=self.depth, num_heads=self.num_heads,
                        mlp_dim=self.mlp_dim, dtype_mm=self.dtype_mm,
                        name="Transformer")
    x, out["encoder"] = trunk(x)
    out["encoded"] = x

    if self.pool_type not in ("map", "gap", "tok"):
      raise ValueError(f"Unknown pool type {self.pool_type!r}")
    map_head = None
    if self.pool_type == "map":
      map_head = vit.MAPHead(num_heads=self.num_heads, mlp_dim=self.mlp_dim)
    x, spatial = vit.readout(x, self.pool_type, map_head)
    out["head_input"] = x

    reps = {"": x, "_2d": spatial.reshape(n, h, w, -1)}
    out.update({f"pre_logits{k}": v for k, v in reps.items()})
    if self.num_classes:
      reps = vit.classify(self, reps, self.num_classes, self.head_zeroinit)
      out.update({f"logits{k}": v for k, v in reps.items()})
    return reps[""], out


def Model(num_classes, *, variant=None, **kw):  # pylint: disable=invalid-name
  return _Model(num_classes, **{**dict(vit.decode_variant(variant)), **kw})


def load(init_params, init_file, model_cfg, dont_load=()):
  """Loads (Flexi)ViT checkpoints, resizing pos+patch embeddings."""
  vanity = {**vit.VANITY_NAMES, **VANITY_NAMES}
  restored = vit.fix_old_checkpoints(
      u.load_params(vanity.get(init_file, init_file)))
  resized = {
      "pos_embedding": vit.resample_posemb(
          old=restored["pos_embedding"],
          new=init_params["pos_embedding"]),
      "embedding": {**restored["embedding"],
                    "kernel": resample_patchemb(
                        old=restored["embedding"]["kernel"],
                        new_hw=tuple(dict(model_cfg)["patch_size"]))},
  }
  return common.merge_params({**restored, **resized}, init_params, dont_load)
