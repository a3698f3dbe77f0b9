"""Depth task adapter: inputs, losses, and predictions for UViM.

Behavior parity: reference trainers/proj/uvim/depth_task.py — float depth
binned into per-patch one-hot classes (bin 0 = "no signal", excluded from
the loss), CE training, expectation-centered unbinning at predict time.
"""

from __future__ import annotations

import jax.numpy as jnp

import big_vision_tpu.utils as u
from big_vision_tpu.trainers.proj.uvim import tasklib

ONE_HOT_AXIS = tasklib.CLASS_AXIS


def _nbins(config):
  return config.model.inputs.depth[ONE_HOT_AXIS]


def input_pp(batch, config):
  """Bins float depth into per-patch one-hot class targets."""
  targets = None
  if "labels" in batch:
    nbins = _nbins(config)
    unit = ((batch["labels"][..., 0] - config.min_depth)
            / (config.max_depth - config.min_depth))
    bins = jnp.clip(jnp.floor(unit * nbins).astype(jnp.int32), 0, nbins - 1)
    targets = {"depth": tasklib.patch_one_hot(bins, config.model.patch_size,
                                              nbins)}
  return {"ctx": tasklib.context_of(batch), "x": targets}


def loss_fn(predictions, batch, config):
  target = input_pp(batch, config)["x"]["depth"]
  ce = u.softmax_xent(logits=predictions["depth"], labels=target,
                      reduction=False, axis=ONE_HOT_AXIS)
  # Bin 0 means "no depth signal here" - keep it out of the loss.
  ce = ce * (jnp.argmax(target, ONE_HOT_AXIS) != 0)
  return ce, {"loss_depth": ce}


def predict_outputs(predictions, config):
  """Patch logits -> float depth map (inverse binning)."""
  assert ONE_HOT_AXIS == -2, "unpatchify assumes classes at axis -2"
  dense = tasklib.unpatchify(predictions["depth"], config)
  # +0.5 reads out the bin center (undoes the binning floor in expectation).
  centers = (jnp.argmax(dense, axis=-1).astype(jnp.float32) + 0.5)
  unit = centers / _nbins(config)
  return {"depth": config.min_depth
          + unit * (config.max_depth - config.min_depth)}
