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
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.models import common, vit


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
  assert old.ndim == 4, "Four dimensions expected"
  assert len(new_hw) == 2, "New shape should be (h, w)"
  if tuple(new_hw) == tuple(old.shape[:2]):
    return old

  rows = _linear_resize_mat_1d(old.shape[0], new_hw[0])
  cols = _linear_resize_mat_1d(old.shape[1], new_hw[1])
  # [prod(new), prod(old)], columns = resized basis kernels.
  op = np.kron(rows, cols)
  pinv = np.linalg.pinv(op.T)

  per_plane = lambda k: (pinv @ k.reshape(-1)).reshape(new_hw)
  # vmap over c_in and width planes.
  return jax.vmap(jax.vmap(per_plane, 2, 2), 3, 3)(old)


class Patchify(nn.Module):
  """Patch embedding whose kernel is PI-resized per requested seqhw."""
  width: int = 768
  patch_size: Sequence[int] = (32, 32)
  seqhw: Optional[int] = None

  @nn.compact
  def __call__(self, image, seqhw=None):
    h, w = image.shape[1:3]
    stored = tuple(self.patch_size)
    kernel_shape = (*stored, image.shape[-1], self.width)
    init = nn.initializers.normal(stddev=self.width ** -0.5)
    kernel = self.param("kernel", init, kernel_shape, image.dtype)
    bias = self.param("bias", nn.initializers.zeros, self.width, image.dtype)

    # The patch size that yields a seqhw x seqhw token grid on this image.
    seqhw = seqhw or self.seqhw
    if seqhw is None and self.is_initializing():
      patch = stored
    else:
      patch = (h // seqhw, w // seqhw)
    if patch != stored:
      kernel = resample_patchemb(old=kernel, new_hw=patch)

    x = jax.lax.conv_general_dilated(
        image, kernel, window_strides=patch, padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x + bias


class _Model(nn.Module):
  """FlexiViT."""
  num_classes: int
  # Stem: the stored kernel's patch size, the canonical posemb grid, and
  # the default token-grid side (None = native patch size).
  patch_size: Sequence[int] = (32, 32)
  posemb_size: Sequence[int] = (7, 7)
  seqhw: Optional[int] = None
  posemb: str = "learn"
  # Trunk/readout.
  depth: int = 12
  width: int = 768
  num_heads: int = 12
  mlp_dim: Optional[int] = None
  pool_type: str = "gap"
  head_zeroinit: bool = True
  dtype_mm: str = "float32"

  @nn.compact
  def __call__(self, image, *, seqhw=None, train=False):
    out = {}
    x = out["stem"] = Patchify(
        width=self.width, patch_size=tuple(self.patch_size),
        seqhw=self.seqhw, name="embedding")(image, seqhw)
    n, h, w, c = x.shape

    # The canonical posemb lives on a fixed posemb_size grid and is
    # bilinearly interpolated to whatever grid this seqhw produced.
    pos = vit.get_posemb(self, self.posemb, tuple(self.posemb_size), c,
                         "pos_embedding", x.dtype)
    if pos.shape[1] != h * w:
      pos = jax.image.resize(
          pos.reshape(1, *self.posemb_size, c), (1, h, w, c), "linear")
      pos = pos.reshape(1, h * w, c)
    x = out["with_posemb"] = x.reshape(n, h * w, c) + pos

    if self.pool_type == "tok":
      x = vit.prepend_cls(self, x)

    x, out["encoder"] = vit.Encoder(
        depth=self.depth, num_heads=self.num_heads, mlp_dim=self.mlp_dim,
        dtype_mm=self.dtype_mm, name="Transformer")(x)
    out["encoded"] = x

    map_head = vit.MAPHead(
        num_heads=self.num_heads, mlp_dim=self.mlp_dim) \
        if self.pool_type == "map" else None
    if self.pool_type not in ("map", "gap", "tok"):
      raise ValueError(f"Unknown pool type {self.pool_type!r}")
    x, spatial = vit.readout(x, self.pool_type, map_head)
    out["head_input"] = x

    reps = {"": x, "_2d": spatial.reshape(n, h, w, -1)}
    out.update({f"pre_logits{k}": v for k, v in reps.items()})
    if self.num_classes:
      reps = vit.classify(self, reps, self.num_classes, self.head_zeroinit)
      out.update({f"logits{k}": v for k, v in reps.items()})
    return reps[""], out


def Model(num_classes, *, variant=None, **kw):  # pylint: disable=invalid-name
  cfg = dict(vit.decode_variant(variant))
  cfg.update(kw)
  return _Model(num_classes, **cfg)


def load(init_params, init_file, model_cfg, dont_load=()):
  """Loads (Flexi)ViT checkpoints, resizing pos+patch embeddings."""
  vanity = {**vit.VANITY_NAMES, **VANITY_NAMES}
  restored = vit.fix_old_checkpoints(
      u.load_params(vanity.get(init_file, init_file)))
  restored["pos_embedding"] = vit.resample_posemb(
      old=restored["pos_embedding"], new=init_params["pos_embedding"])
  restored["embedding"]["kernel"] = resample_patchemb(
      old=restored["embedding"]["kernel"],
      new_hw=tuple(dict(model_cfg)["patch_size"]))
  return common.merge_params(restored, init_params, dont_load)


VANITY_NAMES = {
    "FlexiViT-L i1k": "gs://big_vision/flexivit/flexivit_l_i1k.npz",
    "FlexiViT-B i1k": "gs://big_vision/flexivit/flexivit_b_i1k.npz",
    "FlexiViT-S i1k": "gs://big_vision/flexivit/flexivit_s_i1k.npz",
    "FlexiViT-B i21k 90ep": "gs://big_vision/flexivit/flexivit_b_i21k_90ep.npz",
    "FlexiViT-B i21k 300ep": "gs://big_vision/flexivit/flexivit_b_i21k_300ep.npz",
    "FlexiViT-B i21k 1000ep": "gs://big_vision/flexivit/flexivit_b_i21k_1000ep.npz",
    "ViT-B/16 i21k": "gs://big_vision/flexivit/vit_b16_i21k_300ep.npz",
    "ViT-B/30 i21k": "gs://big_vision/flexivit/vit_b30_i21k_300ep.npz",
}
