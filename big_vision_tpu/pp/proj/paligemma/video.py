"""Video preprocessing ops.

Parity target: reference pp/proj/paligemma/video.py. Frame decode is a
host op (byte strings in); the tensor ops are phase-flexible.
"""

from __future__ import annotations

import io

import jax.numpy as jnp
import numpy as np

from big_vision_tpu.registry import Registry
from big_vision_tpu.pp.ops_image import _pil_resize
from big_vision_tpu.pp.utils import PPOp


@Registry.register("preprocess_ops.video_decode")
def get_video_decode(res):
  """Decodes `episodic_images` (list of jpeg bytes) -> [T,res,res,3] in [-1,1]."""

  def _pp(data):
    from PIL import Image
    data = dict(data)
    frames = []
    for raw in data["episodic_images"]:
      img = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
      # Reference :29 is bare tf.image.resize: bilinear, antialias=False,
      # float32 out.
      frames.append(_pil_resize(img.astype(np.float32), (res, res),
                                "bilinear", antialias=False))
    images = np.stack(frames)
    data["image"] = 2 * (images / 255.0) - 1.0
    return data

  return PPOp(host_fn=_pp, phase="host", staticizer=False,
              name="video_decode")


@Registry.register("preprocess_ops.video_ensure_shape")
def get_video_ensure_shape(key, shape):
  def _pp(data):
    data = dict(data)
    got = tuple(np.asarray(data[key]).shape)
    want = tuple(shape)
    assert all(w is None or g == w for g, w in zip(got, want)), (got, want)
    return data
  return PPOp(fn=_pp, host_fn=_pp, structural=True,
              name="video_ensure_shape")


@Registry.register("preprocess_ops.video_replicate_img")
def get_video_replicate_img(replicas, num_frames):
  """Tiles short videos then truncates to exactly num_frames (ref :53)."""
  def _pp(data):
    data = dict(data)
    image = np.asarray(data["image"])
    image = np.tile(image, [replicas, 1, 1, 1])
    data["image"] = image[:num_frames]
    return data
  return PPOp(host_fn=_pp, phase="host", staticizer=True,
              name="video_replicate_img")


@Registry.register("preprocess_ops.video_choice")
def get_video_choice(empty_fallback=None, key="image", inkey=None,
                     outkey=None):
  """Random single entry of a flattened tensor; fallback if empty (ref :77)."""
  ik, ok = inkey or key, outkey or key

  def _choice(data, np_rng):
    data = dict(data)
    x = np.asarray(data[ik]).reshape(-1)
    if len(x) == 0:
      data[ok] = (np.zeros((), x.dtype) if empty_fallback is None
                  else empty_fallback)
    else:
      data[ok] = x[int(np_rng.integers(0, len(x)))]
    return data

  return PPOp(host_fn=_choice, phase="host", random=True,
              name="video_choice")


@Registry.register("preprocess_ops.stack_images")
def get_stack_images(inkeys=(), outkey="image"):
  def _pp(data):
    data = dict(data)
    data[outkey] = jnp.stack([jnp.asarray(data[k]) for k in inkeys])
    return data

  def _host(data):
    data = dict(data)
    data[outkey] = np.stack([np.asarray(data[k]) for k in inkeys])
    return data

  return PPOp(fn=_pp, host_fn=_host, name="stack_images")
