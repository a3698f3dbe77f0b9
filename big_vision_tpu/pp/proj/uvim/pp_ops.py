"""UViM preprocessing ops: panoptic maps, NYU depth, coordinated crops.

Parity target: reference pp/proj/uvim/pp_ops.py. Variable-shape /
string ops run on the host; fixed-shape tensor math runs as device ops.
"""

from __future__ import annotations

import hashlib

import jax.numpy as jnp
import numpy as np

from big_vision_tpu.registry import Registry
from big_vision_tpu.pp.ops_image import _sample_inception_box
from big_vision_tpu.pp.utils import InKeyOutKey, PPOp, as_pp_op


@Registry.register("preprocess_ops.rgb_to_grayscale_to_rgb")
@as_pp_op()
@InKeyOutKey(indefault="image", outdefault="image")
def get_rgb_to_grayscale_to_rgb():
  """BT.601 luma, replicated back to 3 channels (ref :22)."""
  def _op(image):
    image = jnp.asarray(image)
    gray = (0.2989 * image[..., 0] + 0.587 * image[..., 1]
            + 0.114 * image[..., 2])
    gray = gray.astype(image.dtype) if jnp.issubdtype(
        image.dtype, jnp.integer) else gray
    return jnp.stack([gray] * 3, axis=-1).astype(image.dtype)
  return _op


@Registry.register("preprocess_ops.nyu_eval_crop")
def get_nyu_eval_crop():
  """Crops image+labels to the standard NYU eval window (ref :30)."""
  crop_h, crop_w = slice(54, 54 + 426), slice(41, 41 + 560)

  def _pp(data):
    data = dict(data)
    assert data["labels"].shape == (480, 640, 1), data["labels"].shape
    assert data["image"].shape == (480, 640, 3), data["image"].shape
    data["labels"] = data["labels"][crop_h, crop_w]
    data["image"] = data["image"][crop_h, crop_w]
    return data

  return PPOp(fn=_pp, host_fn=_pp, staticizer=True, name="nyu_eval_crop")


@Registry.register("preprocess_ops.nyu_depth")
@as_pp_op()
@InKeyOutKey(indefault="depth", outdefault="labels")
def get_nyu_depth():
  """float32 [H, W, 1] depth (ref :53)."""
  return lambda depth: jnp.asarray(depth, jnp.float32)[..., None]


@Registry.register("preprocess_ops.coco_panoptic")
def get_coco_panoptic_pp():
  """COCO panoptic id-image -> (semantics, instances) masks (ref :62).

  Instances are numbered 1..N in annotation order; non-annotated pixels
  get -1 (so downstream `make_canonical` can renumber).
  """
  def _coco_panoptic(data):
    data = dict(data)
    ids = np.asarray(data["panoptic_objects"]["id"], np.int64)
    labels = np.asarray(data["panoptic_objects"]["label"], np.int32)
    img = np.asarray(data["panoptic_image"], np.int64)
    id_mask = img[..., 0] + 256 * img[..., 1] + 256 ** 2 * img[..., 2]

    n_masks = (id_mask[:, :, None] == ids[None, None, :]).astype(np.int32)
    inst_idx = np.arange(len(ids), dtype=np.int32)
    instances = np.einsum("hwc,c->hw", n_masks, inst_idx + 1)
    semantics = np.einsum("hwc,c->hw", n_masks, labels + 1)
    data["instances"] = instances[:, :, None].astype(np.int32)
    data["semantics"] = semantics[:, :, None].astype(np.int32)
    return data

  return PPOp(host_fn=_coco_panoptic, phase="host", name="coco_panoptic")


@Registry.register("preprocess_ops.make_canonical")
def get_make_canonical(random=False, main_sort_axis="y", key="labels",
                       inkey=None, outkey=None):
  """Renumbers instance ids in raster order by center of mass (ref :100).

  Host op: the number of instances is data-dependent.
  """
  ik, ok = inkey or key, outkey or key

  def _make_canonical(data, np_rng):
    data = dict(data)
    image = np.asarray(data[ik])
    instimg = image[..., -1]
    ids = np.unique(instimg)
    ids = ids[ids > 0]
    n_masks = (instimg[None] == ids[:, None, None]).astype(np.int32)

    if len(ids):
      if not random:
        centers = np.stack([
            np.argwhere(m).mean(axis=0) for m in n_masks])  # [N, 2] (y, x)
        major = {"y": 0, "x": 1}[main_sort_axis]
        perm = np.argsort(centers[:, 1 - major]
                          + instimg.shape[major] * centers[:, major],
                          kind="stable")
        n_masks = n_masks[perm]
      else:
        n_masks = n_masks[np_rng.permutation(len(ids))]

    idx = np.arange(len(ids), dtype=np.int32)
    can_mask = np.einsum("chw,c->hw", n_masks, idx + 2) - 1
    can_mask = np.where(instimg == 0, 0, can_mask)
    data[ok] = np.concatenate(
        [image[..., :-1], can_mask[..., None].astype(image.dtype)], -1)
    return data

  return PPOp(host_fn=_make_canonical, phase="host", random=True,
              name="make_canonical")


@Registry.register("preprocess_ops.inception_box")
def get_inception_box(*, area=(0.05, 1.0), aspect=(0.75, 1.33),
                      min_obj_cover=0.0, outkey="box", inkey="image"):
  """Samples an inception-style crop box as (begin, size) in [0,1] (ref :141).

  min_obj_cover is accepted for config parity; the coverage constraint is
  not enforced (the reference falls back to the whole image too).
  """
  del min_obj_cover

  def _inception_box(data, np_rng):
    data = dict(data)
    h, w = np.asarray(data[inkey]).shape[:2]
    y0, x0, ch, cw = _sample_inception_box(
        np_rng, h, w, area[0], area[1], aspect[0], aspect[1])
    data[outkey] = (np.asarray([y0 / h, x0 / w], np.float32),
                    np.asarray([ch / h, cw / w], np.float32))
    return data

  return PPOp(host_fn=_inception_box, phase="host", random=True,
              name="inception_box")


@Registry.register("preprocess_ops.crop_box")
def get_crop_box(*, boxkey="box", key="image", inkey=None, outkey=None):
  """Crops by the (begin, size) box produced by inception_box (ref :158)."""
  ik, ok = inkey or key, outkey or key

  def _crop_box(data):
    data = dict(data)
    image = np.asarray(data[ik])
    begin, size = data[boxkey]
    h, w = image.shape[:2]
    y0, x0 = int(begin[0] * h), int(begin[1] * w)
    ch, cw = int(size[0] * h), int(size[1] * w)
    data[ok] = image[y0:y0 + ch, x0:x0 + cw]
    return data

  return PPOp(host_fn=_crop_box, phase="host", name="crop_box")


@Registry.register("preprocess_ops.randu")
def get_randu(key):
  """Uniform [0,1) scalar in `key` (ref :176)."""
  def _randu(data, np_rng):
    data = dict(data)
    data[key] = np.float32(np_rng.uniform())
    return data
  return PPOp(host_fn=_randu, phase="host", random=True, name="randu")


@Registry.register("preprocess_ops.det_fliplr")
def get_det_fliplr(*, randkey="fliplr", key="image", inkey=None,
                   outkey=None):
  """Flips horizontally iff data[randkey] > 0.5 (ref :185)."""
  ik, ok = inkey or key, outkey or key

  def _det_fliplr(data):
    data = dict(data)
    image = jnp.asarray(data[ik])
    flip = (jnp.asarray(data[randkey]) > 0.5).astype(image.dtype)
    data[ok] = image[..., :, ::-1, :] * flip + image * (1 - flip)
    return data

  def _host(data):
    data = dict(data)
    image = np.asarray(data[ik])
    if float(data[randkey]) > 0.5:
      image = image[:, ::-1]
    data[ok] = image
    return data

  return PPOp(fn=_det_fliplr, host_fn=_host, name="det_fliplr")


@Registry.register("preprocess_ops.strong_hash")
def get_strong_hash(key="tfds_id", inkey=None, outkey=None):
  """Stable keyed string hash -> int64 (ref :196; blake2b here)."""
  ik, ok = inkey or key, outkey or key

  def _strong_hash(data):
    data = dict(data)
    s = data[ik]
    s = s if isinstance(s, bytes) else str(s).encode()
    digest = hashlib.blake2b(s, key=b"bvt-strong-hash", digest_size=8)
    data[ok] = np.int64(int.from_bytes(digest.digest(), "little")
                        % np.iinfo(np.int64).max)
    return data

  return PPOp(host_fn=_strong_hash, phase="host", name="strong_hash")
