"""Robustness-augmentation pp ops: randomized resize and JPEG re-encoding.

Parity target: reference pp/proj/paligemma/robustness.py. The reference
randomizes over TF resize kernels; here the host phase randomizes over the
PIL resampling filters (bilinear/bicubic/lanczos/box/hamming/nearest),
which spans the same family of interpolation artifacts.
"""

from __future__ import annotations

import io

import numpy as np

from big_vision_tpu.registry import Registry
from big_vision_tpu.pp.utils import PPOp, maybe_repeat


@Registry.register("preprocess_ops.resize_r")
def get_resize_r(size, key="image", inkey=None, outkey=None):
  """Resize with a randomly chosen interpolation filter (ref :25)."""
  size = maybe_repeat(size, 2)
  ik, ok = inkey or key, outkey or key

  def _resize_r(data, np_rng):
    from PIL import Image
    filters = [Image.Resampling.BILINEAR, Image.Resampling.BICUBIC,
               Image.Resampling.LANCZOS, Image.Resampling.BOX,
               Image.Resampling.HAMMING, Image.Resampling.NEAREST]
    data = dict(data)
    img = np.asarray(data[ik])
    dtype = img.dtype
    pil_filter = filters[int(np_rng.integers(0, len(filters)))]
    resized = np.asarray(Image.fromarray(img.astype(np.uint8)).resize(
        (size[1], size[0]), pil_filter))
    info = np.iinfo(dtype) if np.issubdtype(dtype, np.integer) else None
    if info is not None:
      resized = np.clip(resized, info.min, info.max)
    data[ok] = resized.astype(dtype)
    return data

  return PPOp(host_fn=_resize_r, phase="host", random=True,
              staticizer=True, name="resize_r")


@Registry.register("preprocess_ops.random_jpeg")
def get_random_jpeg(p, key="image", inkey=None, outkey=None):
  """With probability p, JPEG encode-decode at quality U[75, 95] (ref :49)."""
  ik, ok = inkey or key, outkey or key

  def _random_jpeg(data, np_rng):
    from PIL import Image
    data = dict(data)
    img = np.asarray(data[ik])
    if np_rng.uniform() < p:
      quality = int(np_rng.integers(75, 96))
      buf = io.BytesIO()
      Image.fromarray(img.astype(np.uint8)).save(
          buf, format="JPEG", quality=quality)
      buf.seek(0)
      img = np.asarray(Image.open(buf).convert("RGB")).astype(img.dtype)
    data[ok] = img
    return data

  return PPOp(host_fn=_random_jpeg, phase="host", random=True,
              name="random_jpeg")
