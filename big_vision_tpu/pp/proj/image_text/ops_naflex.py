"""NaFlex preprocessing: AR-preserving resize to a token budget + patchify.

Parity target: reference pp/proj/image_text/ops_naflex.py (binary-search
size selection :25-79, resize_to_sequence :82, central_crop_to_sequence
:129, patchify :171, tuplify :196). Host phase (variable shapes); downstream
pad_to_shape on the patch keys staticizes for the device.
"""

from __future__ import annotations

import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.registry import Registry
from big_vision_tpu.pp.utils import PPOp, maybe_repeat
from big_vision_tpu.pp.ops_image import _pil_resize


def get_image_size_for_seq(image_hw, patch_size, max_sequence_len,
                           divisible_by_patch=True, eps=1e-5):
  """Binary search for the largest AR-preserving size within the budget."""
  h, w = image_hw

  def prepare(ratio):
    th, tw = h * ratio, w * ratio
    if divisible_by_patch:
      th = patch_size * np.ceil(th / patch_size)
      tw = patch_size * np.ceil(tw / patch_size)
    return (int(max(th, patch_size)), int(max(tw, patch_size)))

  def feasible(ratio):
    th, tw = prepare(ratio)
    # True division like the reference (:62 `target_hw / patch_size`):
    # with divisible_by_patch=False the fractional patch counts matter.
    return (th / patch_size) * (tw / patch_size) <= max_sequence_len

  lb, rb = eps / 10, 100.0
  while rb - lb >= eps:
    mid = (lb + rb) / 2
    if feasible(mid):
      lb = mid
    else:
      rb = mid
  assert eps < lb < 100.0, "Binary search failed"
  return lb, prepare(lb)


@Registry.register("preprocess_ops.resize_to_sequence")
def get_resize_to_sequence(patch_size, max_sequence_len,
                           divisible_by_patch=True, eps=1e-5, key="image",
                           inkey=None, outkey=None):
  """AR-preserving resize so patchified seq len <= budget."""
  ik, ok = inkey or key, outkey or key

  def _op(data):
    data = dict(data)
    img = np.asarray(data[ik])
    _, target_hw = get_image_size_for_seq(
        img.shape[:2], patch_size, max_sequence_len,
        divisible_by_patch, eps)
    # Bare tf.image.resize in the reference (:120): float32 out, no cast
    # back to the input dtype.
    data[ok] = _pil_resize(img.astype(np.float32), target_hw, "bilinear",
                           antialias=True)
    return data

  return PPOp(host_fn=_op, phase="host", name="resize_to_sequence")


@Registry.register("preprocess_ops.central_crop_to_sequence")
def get_central_crop_to_sequence(patch_size, max_sequence_len,
                                 divisible_by_patch=True, eps=1e-5,
                                 key="image", inkey=None, outkey=None):
  ik, ok = inkey or key, outkey or key

  def _op(data):
    data = dict(data)
    img = np.asarray(data[ik])
    _, (th, tw) = get_image_size_for_seq(
        img.shape[:2], patch_size, max_sequence_len,
        divisible_by_patch, eps)
    assert img.shape[0] >= th and img.shape[1] >= tw, (
        "central_crop_to_sequence needs an image at least target-sized")
    oy = (img.shape[0] - th) // 2
    ox = (img.shape[1] - tw) // 2
    data[ok] = img[oy:oy + th, ox:ox + tw]
    return data

  return PPOp(host_fn=_op, phase="host",
              name="central_crop_to_sequence")


@Registry.register("preprocess_ops.patchify")
def get_patchify(patch_size, key="image", inkey=None, outkey=None):
  """image -> dict(patches [N, p*p*c], yidx, xidx, type)."""
  ph, pw = maybe_repeat(patch_size, 2)
  ik, ok = inkey or key, outkey or key

  def _op(data):
    data = dict(data)
    img = np.asarray(data[ik])
    h, w, c = img.shape
    nh, nw = h // ph, w // pw
    patches = img[:nh * ph, :nw * pw].reshape(nh, ph, nw, pw, c)
    patches = patches.transpose(0, 2, 1, 3, 4).reshape(nh * nw,
                                                       ph * pw * c)
    gy, gx = np.meshgrid(np.arange(nh), np.arange(nw), indexing="ij")
    data[ok] = {
        "patches": patches,
        "yidx": gy.reshape(-1).astype(np.int32),
        "xidx": gx.reshape(-1).astype(np.int32),
        "type": np.ones(nh * nw, np.int32),
    }
    return data

  return PPOp(host_fn=_op, phase="host", name="patchify")


@Registry.register("preprocess_ops.tuplify")
def get_tuplify(inkeys, outkey):
  def _op(data):
    data = dict(data)
    data[outkey] = tuple(u.tree_get(data, k) for k in inkeys)
    return data
  return PPOp(host_fn=_op, phase="host", structural=True, name="tuplify")
