"""Referring-expression segmentation evaluator (mIoU + box accuracy).

Behavior parity: reference evaluators/proj/paligemma/transfers/segmentation.py.
The model emits 4 <locXXXX> box tokens + 16 <segXXX> codebook tokens; a
small pretrained VQ-VAE decoder (arXiv:2301.02229) reconstructs a 64x64
mask which is rescaled into the predicted box and IoU'd against the
full-resolution GT mask on the host.

The mask-decoder checkpoint (vae-oid.npz) must be available locally (the
reference pulls it from GCS); pass its path as `model=`. Mask
reconstruction runs as a jitted CPU program, as in the reference.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.evaluators.common as c
from big_vision_tpu.evaluators.proj.paligemma.transfers import driver

API = "jit"

N_LOC, N_SEG = 4, 16  # tokens per prediction: box corners + codebook ids


def _box_area(box):
  y1, x1, y2, x2 = box
  return max(y2 - y1, 0.0) * max(x2 - x1, 0.0)


def _box_iou(a, b):
  """IoU of two [y1,x1,y2,x2] boxes in relative coordinates."""
  inter = (max(a[0], b[0]), max(a[1], b[1]), min(a[2], b[2]), min(a[3], b[3]))
  union = _box_area(a) + _box_area(b) - _box_area(inter)
  return _box_area(inter) / union if union else 0.0


class Evaluator(driver.DecodeScorer):
  """Instance-segmentation eval over decoded loc/seg token sequences."""

  CPU_KEYS = frozenset({"prefix", "suffix", "objects/mask", "objects/bbox"})

  def __init__(self, *args, model="vae-oid.npz", det_ious=(0.5, 0.75),
               **kw):
    super().__init__(*args, **kw)
    # The tokenizer must carry tokensets=("loc", "seg").
    (self.loc0,) = np.asarray(self.tok.to_int("<loc0000>"))
    (self.seg0,) = np.asarray(self.tok.to_int("<seg000>"))
    self._model = model
    self.reconstruct_masks = None  # Lazily built (needs the vae npz).
    self.det_ious = det_ious

  def _parse(self, sequence):
    """Decoded tokens -> (valid, [4 box ints in 0..1023, 16 codes 0..127])."""
    out = np.zeros(N_LOC + N_SEG, np.int32)
    ids = np.concatenate([sequence[:N_LOC] - self.loc0,
                          sequence[N_LOC:N_LOC + N_SEG] - self.seg0])
    if len(ids) != N_LOC + N_SEG:
      return False, out
    box, codes = ids[:N_LOC], ids[N_LOC:]
    ok = ((box >= 0).all() and (box <= 1023).all()
          and (codes >= 0).all() and (codes <= 127).all()
          and box[2] > box[0] and box[3] > box[1])
    if ok:
      out[:] = ids
    return bool(ok), out

  def run(self, train_state):
    if self.reconstruct_masks is None:
      self.reconstruct_masks = get_reconstruct_masks(self._model)

    ious = []  # No s/m/l split: all RefCOCO objects are large (>96px^2).
    det_hits = {thresh: [] for thresh in self.det_ious}
    invalid = total = 0

    for decoded, keep, batch in self.batches(train_state):
      keep = np.asarray(keep).astype(bool)
      decoded = np.asarray(decoded)[keep]
      gt_masks = [np.asarray(m)[:, :, 0] > 0
                  for m, k in zip(batch["objects/mask"], keep) if k]
      gt_boxes = [np.asarray(b)
                  for b, k in zip(batch["objects/bbox"], keep) if k]

      parsed = [self._parse(seq) for seq in decoded]
      tokens = np.stack([t for _, t in parsed]) if parsed else (
          np.zeros((0, N_LOC + N_SEG), np.int32))
      masks64 = np.asarray(self.reconstruct_masks(tokens[:, N_LOC:]))[..., 0]
      boxes = tokens[:, :N_LOC] / 1023  # back to [0, 1] coordinates

      for (ok, _), mask64, box, gt_mask, gt_box in zip(
          parsed, masks64, boxes, gt_masks, gt_boxes):
        total += 1
        biou = _box_iou(box, gt_box)
        for thresh in det_hits:
          det_hits[thresh].append(thresh <= biou)

        h, w = gt_mask.shape
        y1, x1, y2, x2 = (int(v) for v in
                          (box[0] * h, box[1] * w, box[2] * h, box[3] * w))
        if not ok or x2 <= x1 or y2 <= y1:
          invalid += 1
          ious.append(0.0)
          continue
        pred = _resize_bilinear(mask64, (y2 - y1, x2 - x1)) > 0.0
        inter = (gt_mask[y1:y2, x1:x2] & pred).sum()
        ious.append(inter / (gt_mask.sum() + pred.sum() - inter))

    stats = c.process_sum([
        sum(ious), len(ious),
        {k: sum(v) for k, v in det_hits.items()},
        {k: len(v) for k, v in det_hits.items()},
        invalid, total])
    iou_sum, iou_num, det_sum, det_num, invalid, total = stats

    yield "miou", iou_sum / max(iou_num, 1)
    for thresh in det_sum:
      yield f"boxacc/{thresh}", det_sum[thresh] / max(det_num[thresh], 1)
    yield "invalid", invalid
    yield "total", total


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


class ResBlock(nn.Module):
  features: int

  @nn.compact
  def __call__(self, x):
    skip = x
    x = nn.relu(nn.Conv(self.features, (3, 3), padding=1)(x))
    x = nn.relu(nn.Conv(self.features, (3, 3), padding=1)(x))
    return skip + nn.Conv(self.features, (1, 1), padding=0)(x)


class Decoder(nn.Module):
  """Upscales [B,4,4,D] quantized vectors to a [B,64,64,1] mask."""

  @nn.compact
  def __call__(self, x):
    dim = 128
    x = nn.relu(nn.Conv(dim, (1, 1), padding=0)(x))
    for _ in range(2):
      x = ResBlock(features=dim)(x)
    for _ in range(4):
      x = nn.relu(nn.ConvTranspose(dim, (4, 4), strides=(2, 2), padding=2,
                                   transpose_kernel=True)(x))
      dim //= 2
    return nn.Conv(1, (1, 1), padding=0)(x)


def _torch_to_flax(checkpoint):
  """Converts the released PyTorch checkpoint layout to flax params."""
  def conv(name):
    return {"bias": checkpoint[name + ".bias"],
            "kernel": np.transpose(checkpoint[name + ".weight"],
                                   (2, 3, 1, 0))}

  def resblock(name):
    return {f"Conv_{i}": conv(f"{name}.{2 * i}") for i in range(3)}

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


@functools.cache
def get_reconstruct_masks(model):
  """[B,16] int32 codebook indices -> [B,64,64,1] masks in [-1, 1]."""
  with open(model, "rb") as f:
    params = _torch_to_flax(dict(np.load(f)))
  codebook = params["_embeddings"]

  def reconstruct(codes):
    batch = codes.shape[0]
    quantized = jnp.take(codebook, codes.reshape(-1), axis=0)
    quantized = quantized.reshape((batch, 4, 4, codebook.shape[-1]))
    return Decoder().apply({"params": params}, quantized)

  cpu = jax.local_devices(backend="cpu")[0]
  jitted = jax.jit(reconstruct)
  return lambda codes: jitted(jax.device_put(jnp.asarray(codes), cpu))
