"""FlexiViT: ViT with a runtime-selectable patch size.

Parity target: reference models/proj/flexi/vit.py (PI-resize of the patch
kernel `resample_patchemb` :30, Patchify :78, posemb resize, _Model :110).
The PI-resize inverts patch resizing: a B/8 kernel loaded into a B/16 model
on a 2x image matches. jax.image.resize (linear) replaces the reference's
tf.image.resize (same bilinear sampling).
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
  """PI-resize of a patch-embedding kernel [h, w, c_in, width]."""
  assert len(old.shape) == 4, "Four dimensions expected"
  assert len(new_hw) == 2, "New shape should be (h, w)"
  if tuple(old.shape[:2]) == tuple(new_hw):
    return old

  def get_resize_mat(old_shape, new_shape):
    # 2-D separable resize = kron of the two 1-D resize matrices; columns
    # are the resized basis kernels, as in the reference (vit.py:30).
    mh = _linear_resize_mat_1d(old_shape[0], new_shape[0])
    mw = _linear_resize_mat_1d(old_shape[1], new_shape[1])
    return np.kron(mh, mw)  # [prod(new), prod(old)] acting on flat kernels

  resize_mat = get_resize_mat(old.shape[:2], new_hw)
  # PI-resize: pseudo-inverse of the transposed resize operator, so that
  # resampled-kernel @ resized-patch ~= kernel @ patch (ref vit.py:45).
  resize_mat_pinv = np.linalg.pinv(resize_mat.T)

  def resample_kernel(kernel):
    return (resize_mat_pinv @ kernel.reshape(-1)).reshape(new_hw)
  v_resample = jax.vmap(jax.vmap(resample_kernel, 2, 2), 3, 3)
  return v_resample(old)


class Patchify(nn.Module):
  """Patch embedding whose kernel is PI-resized per requested seqhw."""
  patch_size: Sequence[int] = (32, 32)
  width: int = 768
  seqhw: Optional[int] = None

  @nn.compact
  def __call__(self, image, seqhw=None):
    n, h, w, c = image.shape
    w_emb = self.param(
        "kernel", nn.initializers.normal(stddev=1 / np.sqrt(self.width)),
        (*self.patch_size, c, self.width), image.dtype)
    b_emb = self.param("bias", nn.initializers.zeros, self.width,
                       image.dtype)

    seqhw = seqhw or self.seqhw
    if seqhw is None and self.is_initializing():
      patch_size = tuple(self.patch_size)
    else:
      patch_size = tuple(np.array((h, w)) // np.array((seqhw, seqhw)))

    if patch_size != tuple(self.patch_size):
      w_emb = resample_patchemb(old=w_emb, new_hw=patch_size)

    x = jax.lax.conv_general_dilated(
        image, w_emb, window_strides=patch_size, padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x + b_emb


class _Model(nn.Module):
  """FlexiViT."""
  num_classes: int
  patch_size: Sequence[int] = (32, 32)
  posemb_size: Sequence[int] = (7, 7)
  width: int = 768
  depth: int = 12
  mlp_dim: Optional[int] = None
  num_heads: int = 12
  posemb: str = "learn"
  pool_type: str = "gap"
  head_zeroinit: bool = True
  seqhw: Optional[int] = None
  dtype_mm: str = "float32"

  @nn.compact
  def __call__(self, image, *, seqhw=None, train=False):
    out = {}
    x = out["stem"] = Patchify(
        tuple(self.patch_size), self.width, self.seqhw,
        name="embedding")(image, seqhw)

    n, h, w, c = x.shape
    x = jnp.reshape(x, [n, h * w, c])

    pos_emb = vit.get_posemb(self, self.posemb, tuple(self.posemb_size), c,
                             "pos_embedding", x.dtype)
    if pos_emb.shape[1] != h * w:
      pos_emb = jnp.reshape(pos_emb, (1, *self.posemb_size, c))
      pos_emb = jax.image.resize(pos_emb, (1, h, w, c), "linear")
      pos_emb = jnp.reshape(pos_emb, (1, h * w, c))
    x = out["with_posemb"] = x + pos_emb

    if self.pool_type == "tok":
      cls = self.param("cls", nn.initializers.zeros, (1, 1, c), x.dtype)
      x = jnp.concatenate([jnp.tile(cls, [n, 1, 1]), x], axis=1)

    x, out["encoder"] = vit.Encoder(
        depth=self.depth, mlp_dim=self.mlp_dim, num_heads=self.num_heads,
        dtype_mm=self.dtype_mm, name="Transformer")(x)
    encoded = out["encoded"] = x

    if self.pool_type == "map":
      x = out["head_input"] = vit.MAPHead(
          num_heads=self.num_heads, mlp_dim=self.mlp_dim)(x)
    elif self.pool_type == "gap":
      x = out["head_input"] = jnp.mean(x, axis=1)
    elif self.pool_type == "tok":
      x = out["head_input"] = x[:, 0]
      encoded = encoded[:, 1:]
    else:
      raise ValueError(f"Unknown pool type {self.pool_type!r}")

    x_2d = jnp.reshape(encoded, [n, h, w, -1])
    out["pre_logits_2d"] = x_2d
    out["pre_logits"] = x

    if self.num_classes:
      kw = ({"kernel_init": nn.initializers.zeros}
            if self.head_zeroinit else {})
      head = nn.Dense(self.num_classes, name="head", **kw)
      x_2d = out["logits_2d"] = head(x_2d)
      x = out["logits"] = head(x)
    return x, out


def Model(num_classes, *, variant=None, **kw):  # pylint: disable=invalid-name
  return _Model(num_classes, **{**vit.decode_variant(variant), **kw})


def load(init_params, init_file, model_cfg, dont_load=()):
  """Loads (Flexi)ViT checkpoints, resizing pos+patch embeddings."""
  init_file = {**vit.VANITY_NAMES, **VANITY_NAMES}.get(init_file, init_file)
  restored = u.load_params(init_file)
  restored = vit.fix_old_checkpoints(restored)
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
