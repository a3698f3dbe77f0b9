"""Segmentation pp: encode a GT mask into <locXXXX>/<segXXX> token strings.

Parity target: reference pp/proj/paligemma/segmentation.py. The mask VQ
encoder (arXiv:2301.02229 layout, same checkpoint as the eval-side decoder
in evaluators/.../transfers/segmentation.py) runs as a jitted CPU program
here instead of inline TF ops. The checkpoint npz must be available
locally; pass its path as `model=`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from big_vision_tpu.registry import Registry
from big_vision_tpu.pp.ops_image import _pil_resize
from big_vision_tpu.pp.utils import PPOp

NUM_DOWNSAMPLE_LAYERS = 4
NUM_RES_BLOCKS = 2


@functools.cache
def get_checkpoint(model):
  with open(model, "rb") as f:
    return dict(np.load(f))


def _conv(ckpt, x, strides, name):
  kernel = jnp.asarray(np.transpose(ckpt[name + ".weight"], (2, 3, 1, 0)))
  bias = jnp.asarray(ckpt[name + ".bias"])
  return jax.lax.conv_general_dilated(
      x, kernel, window_strides=(strides, strides), padding="SAME",
      dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias


def _resblock(ckpt, x, name):
  orig = x
  x = jax.nn.relu(_conv(ckpt, x, 1, name + ".0"))
  x = jax.nn.relu(_conv(ckpt, x, 1, name + ".2"))
  return _conv(ckpt, x, 1, name + ".4") + orig


def encode_to_codebook_indices(ckpt, masks):
  """[B, 64, 64, 1] masks in [0,1] -> [B, 16] codebook ids in range(128)."""
  x = 2.0 * (jnp.asarray(masks, jnp.float32) - 0.5)
  for n in range(NUM_DOWNSAMPLE_LAYERS):
    x = jax.nn.relu(_conv(ckpt, x, 2, f"encoder.{2 * n}"))
  for n in range(NUM_RES_BLOCKS):
    x = _resblock(ckpt, x, f"encoder.{8 + n}.net")
  x = _conv(ckpt, x, 1, "encoder.10")

  embeddings = jnp.asarray(ckpt["_vq_vae._embedding"])
  flat = x.reshape(-1, embeddings.shape[1])
  d = (jnp.sum(flat ** 2, 1, keepdims=True)
       + jnp.sum(embeddings ** 2, 1)
       - 2 * flat @ embeddings.T)
  return jnp.argmin(d, axis=1).reshape(-1, 16)


@functools.cache
def _get_encode_fn(model):
  ckpt = get_checkpoint(model)
  cpu = jax.local_devices(backend="cpu")[0]
  jitted = jax.jit(lambda m: encode_to_codebook_indices(ckpt, m))
  return lambda m: jitted(jax.device_put(jnp.asarray(m), cpu))


@Registry.register("preprocess_ops.refcoco_mask2str")
def get_refcoco_mask2str(model="vae-oid.npz"):
  """Turns (mask, bbox, sentence) into prefix/suffix strings (ref :38)."""

  def _refcoco_mask2str(data):
    data = dict(data)
    mask = np.asarray(data["objects/mask"])
    assert mask.ndim == 3, mask.shape  # requires choice()
    sentence = data["objects/refs/sentence"]
    if isinstance(sentence, bytes):
      sentence = sentence.decode()
    bbox = np.asarray(data["objects/bbox"], np.float32).reshape(4)

    h, w = mask.shape[:2]
    y1 = int(round(h * bbox[0]))
    x1 = int(round(w * bbox[1]))
    y2 = int(round(h * bbox[2]))
    x2 = int(round(w * bbox[3]))
    crop = mask[y1:y2, x1:x2, :1].astype(np.uint8)
    crop64 = _pil_resize(np.repeat(crop, 3, -1), (64, 64), "bilinear",
                         antialias=True)[..., :1] / 255.0

    indices = np.asarray(_get_encode_fn(model)(crop64[None]))[0]
    mask_string = "".join(f"<seg{int(i):03d}>" for i in indices)
    binned = np.clip(np.round(bbox * 1023).astype(int), 0, 1023)
    loc_string = "".join(f"<loc{int(i):04d}>" for i in binned)

    data["prefix"] = sentence
    data["suffix"] = loc_string + mask_string
    return data

  return PPOp(host_fn=_refcoco_mask2str, phase="host",
              name="refcoco_mask2str")
