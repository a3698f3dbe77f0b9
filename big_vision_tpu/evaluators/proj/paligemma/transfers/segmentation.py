"""Referring-expression segmentation evaluator (mIoU + box accuracy).

Parity target: reference evaluators/proj/paligemma/transfers/segmentation.py.
The model emits 4 <locXXXX> box tokens + 16 <segXXX> codebook tokens; a
small pretrained VQ-VAE decoder (arXiv:2301.02229) reconstructs a 64x64
mask which is rescaled into the predicted box and IoU'd against the
full-resolution GT mask on the host.

The mask-decoder checkpoint (vae-oid.npz) must be available locally (the
reference pulls it from GCS); pass its path as `model=`. The decode step
runs as a jitted CPU program, per the reference.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.evaluators.common as c
import big_vision_tpu.pp.tokenizer
import big_vision_tpu.utils as u

API = "jit"


def _inrange(a, min_value, max_value):
  return (np.clip(a, min_value, max_value) == a).all()


def _area(y1, x1, y2, x2):
  return max(x2 - x1, 0.0) * max(y2 - y1, 0.0)


class Evaluator:
  """Instance-segmentation eval over decoded loc/seg token sequences."""

  def __init__(self, predict_fn, tokenizer, model="vae-oid.npz",
               det_ious=(0.5, 0.75), *, devices, **kw):
    self.get_data_iter, self.steps = c.eval_input_pipeline(
        keep_on_cpu={"prefix", "suffix", "objects/mask", "objects/bbox"},
        devices=devices, **kw)
    self.tok = big_vision_tpu.pp.tokenizer.get_tokenizer(tokenizer)
    self.decode = predict_fn
    self.loc0 = np.array(self.tok.to_int("<loc0000>"))
    self.seg0 = np.array(self.tok.to_int("<seg000>"))
    # The tokenizer must have tokensets=("loc", "seg").
    assert self.loc0.shape == (1,), self.loc0
    assert self.seg0.shape == (1,), self.seg0
    self._model = model
    self.reconstruct_masks = None  # Lazily built (needs the vae npz).
    self.det_ious = det_ious

  def run(self, train_state):
    if self.reconstruct_masks is None:
      self.reconstruct_masks = get_reconstruct_masks(self._model)

    ious = []  # No s/m/l split: all objects are large (>96px^2).
    det_by_iou = {iou: [] for iou in self.det_ious}
    invalid = total = 0
    for _, batch in zip(range(self.steps), self.get_data_iter()):
      decoded = self.decode(train_state, batch)
      not_padding = np.asarray(
          u.get_local_slice_from_fsarray(batch["_mask"])).astype(bool)
      decoded = np.asarray(
          u.get_local_slice_from_fsarray(decoded))[not_padding]

      gt_masks = [np.asarray(m)[:, :, 0] > 0
                  for m, keep in zip(batch["objects/mask"], not_padding)
                  if keep]
      gt_bbs = [np.asarray(b)
                for b, keep in zip(batch["objects/bbox"], not_padding)
                if keep]

      valid = []
      tokens = np.zeros([decoded.shape[0], 4 + 16], np.int32)
      for i, dec in enumerate(decoded):
        t = np.r_[dec[:4] - self.loc0, dec[4:4 + 16] - self.seg0]
        if (len(t) == 4 + 16
            and _inrange(t[:4], 0, 1023)
            and _inrange(t[4:], 0, 127)
            and t[2] > t[0] and t[3] > t[1]):
          valid.append(True)
          tokens[i] = t
        else:
          valid.append(False)

      mask64 = np.asarray(self.reconstruct_masks(tokens[:, 4:]))[..., 0]
      bbox = tokens[:, :4] / 1023  # Back to [0, 1] coordinates.

      for v, m64, gtm, bb, gtbb in zip(valid, mask64, gt_masks, bbox,
                                       gt_bbs):
        total += 1
        h, w = gtm.shape

        y1, x1, y2, x2 = bb
        gty1, gtx1, gty2, gtx2 = gtbb
        ibb = max(y1, gty1), max(x1, gtx1), min(y2, gty2), min(x2, gtx2)
        denom = _area(*bb) + _area(*gtbb) - _area(*ibb)
        box_iou = _area(*ibb) / denom if denom else 0.0
        for iou_thresh in det_by_iou:
          det_by_iou[iou_thresh].append(iou_thresh <= box_iou)

        gt_area = gtm.sum()
        y1, x1, y2, x2 = map(int, (y1 * h, x1 * w, y2 * h, x2 * w))
        if not v or x2 <= x1 or y2 <= y1:
          iou = 0.0
          invalid += 1
        else:
          mi = _resize_bilinear(m64, (y2 - y1, x2 - x1)) > 0.0
          iarea = (gtm[y1:y2, x1:x2] & mi).sum()
          iou = iarea / (gt_area + mi.sum() - iarea)
        ious.append(iou)

    sum_ious, num_ious, sum_dets, num_dets, num_invalid, num = (
        c.process_sum([
            sum(ious), len(ious),
            {k: sum(v) for k, v in det_by_iou.items()},
            {k: len(v) for k, v in det_by_iou.items()},
            invalid, total]))

    yield "miou", sum_ious / max(num_ious, 1)
    for k in sum_dets:
      yield f"boxacc/{k}", sum_dets[k] / max(num_dets[k], 1)
    yield "invalid", num_invalid
    yield "total", num


def _resize_bilinear(mask, hw):
  """[64,64] float mask -> arbitrary size, PIL if present else jax."""
  try:
    import PIL.Image
    return np.asarray(PIL.Image.fromarray(mask).resize(
        (hw[1], hw[0]), resample=PIL.Image.BILINEAR))
  except ImportError:
    return np.asarray(jax.image.resize(jnp.asarray(mask), hw, "bilinear"))


# ---------------------------------------------------------------------------
# Pretrained VQ-VAE mask decoder (checkpoint layout from arXiv:2301.02229).
# ---------------------------------------------------------------------------


def _get_params(checkpoint):
  """Converts the released PyTorch checkpoint layout to flax params."""
  def transp(kernel):
    return np.transpose(kernel, (2, 3, 1, 0))

  def conv(name):
    return {"bias": checkpoint[name + ".bias"],
            "kernel": transp(checkpoint[name + ".weight"])}

  def resblock(name):
    return {"Conv_0": conv(name + ".0"),
            "Conv_1": conv(name + ".2"),
            "Conv_2": conv(name + ".4")}

  return {
      "_embeddings": checkpoint["_vq_vae._embedding"],
      "Conv_0": conv("decoder.0"),
      "ResBlock_0": resblock("decoder.2.net"),
      "ResBlock_1": resblock("decoder.3.net"),
      "ConvTranspose_0": conv("decoder.4"),
      "ConvTranspose_1": conv("decoder.6"),
      "ConvTranspose_2": conv("decoder.8"),
      "ConvTranspose_3": conv("decoder.10"),
      "Conv_1": conv("decoder.12"),
  }


def _quantized_from_indices(codebook_indices, embeddings):
  batch_size, num_tokens = codebook_indices.shape
  assert num_tokens == 16, codebook_indices.shape
  _, embedding_dim = embeddings.shape
  encodings = jnp.take(embeddings, codebook_indices.reshape(-1), axis=0)
  return encodings.reshape((batch_size, 4, 4, embedding_dim))


class ResBlock(nn.Module):
  features: int

  @nn.compact
  def __call__(self, x):
    original_x = x
    x = nn.relu(nn.Conv(self.features, (3, 3), padding=1)(x))
    x = nn.relu(nn.Conv(self.features, (3, 3), padding=1)(x))
    x = nn.Conv(self.features, (1, 1), padding=0)(x)
    return x + original_x


class Decoder(nn.Module):
  """Upscales [B,4,4,D] quantized vectors to a [B,64,64,1] mask."""

  @nn.compact
  def __call__(self, x):
    dim = 128
    x = nn.relu(nn.Conv(dim, (1, 1), padding=0)(x))
    for _ in range(2):
      x = ResBlock(features=dim)(x)
    for _ in range(4):
      x = nn.ConvTranspose(dim, (4, 4), strides=(2, 2), padding=2,
                           transpose_kernel=True)(x)
      x = nn.relu(x)
      dim //= 2
    return nn.Conv(1, (1, 1), padding=0)(x)


@functools.cache
def get_reconstruct_masks(model):
  """[B,16] int32 codebook indices -> [B,64,64,1] masks in [-1, 1]."""
  with open(model, "rb") as f:
    params = _get_params(dict(np.load(f)))

  def reconstruct_masks(codebook_indices):
    quantized = _quantized_from_indices(codebook_indices,
                                        params["_embeddings"])
    return Decoder().apply({"params": params}, quantized)

  cpu = jax.local_devices(backend="cpu")[0]
  jitted = jax.jit(reconstruct_masks)
  return lambda idx: jitted(jax.device_put(jnp.asarray(idx), cpu))
