"""Panoptic task adapter: inputs, losses, and predictions for UViM.

Behavior parity: reference trainers/proj/uvim/panoptic_task.py — per-patch
one-hot semantics/instances targets, summed per-channel softmax CE, and
the argmax-instances + majority-vote-semantics panoptic readout with a
minimum-segment-area filter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import big_vision_tpu.utils as u
from big_vision_tpu.trainers.proj.uvim import tasklib

ONE_HOT_AXIS = tasklib.CLASS_AXIS

CHANNELS = ("semantics", "instances")


def input_pp(batch, config):
  """(B,H,W,2) labels -> per-patch one-hot semantics/instances dicts."""
  targets = None
  if "labels" in batch:  # Phase-II predict has no labels.
    targets = {
        key: tasklib.patch_one_hot(
            batch["labels"][..., idx], config.model.patch_size,
            config.model.inputs[key][ONE_HOT_AXIS])
        for idx, key in enumerate(CHANNELS)}
  return {"ctx": tasklib.context_of(batch), "x": targets}


def loss_fn(logits, batch, config):
  targets = input_pp(batch, config)["x"]
  per_channel = {
      f"loss_{key}": u.softmax_xent(logits=logits[key], labels=targets[key],
                                    reduction=False, axis=ONE_HOT_AXIS)
      for key in CHANNELS}
  return sum(per_channel.values()), per_channel


def predict_outputs(logits, config, min_fraction=0.0):
  """Patch logits -> (B, H, W, 2) panoptic map."""
  assert ONE_HOT_AXIS == -2, "unpatchify assumes classes at axis -2"
  dense = {key: tasklib.unpatchify(logits[key], config) for key in CHANNELS}
  return panoptic_predictions_from_logits(**dense, min_fraction=min_fraction)


def panoptic_predictions_from_logits(semantics, instances, min_fraction=0.0):
  """Argmax instances, then majority-vote one semantic label per segment.

  Per-segment quantities (majority semantic label, area fraction) are
  painted back onto pixels with a take_along_axis gather over the segment
  id map — one gather per quantity instead of the one-hot einsums the
  reference uses (reference panoptic_task.py:66-80), same results.
  """
  b, h, w, n_seg = instances.shape
  ids = jnp.argmax(instances, axis=-1)  # [B,H,W] segment id per pixel
  segments = jax.nn.one_hot(ids, n_seg, dtype=semantics.dtype)

  # Majority vote: accumulate semantic evidence within each segment.
  votes = jnp.einsum("bhwk,bhwn->bnk", semantics, segments)
  winner = jnp.argmax(votes, axis=-1)  # [B, n_seg]

  flat_ids = ids.reshape(b, h * w)
  paint = lambda per_seg: jnp.take_along_axis(
      per_seg, flat_ids, axis=1).reshape(b, h, w)

  sem = paint(winner)
  # Void out segments covering less than min_fraction of the image.
  fraction = jnp.sum(segments, axis=(1, 2)) / (h * w)  # [B, n_seg]
  visible = paint(fraction > min_fraction)
  return jnp.stack([sem, ids], axis=-1) * visible[..., None].astype("int32")
