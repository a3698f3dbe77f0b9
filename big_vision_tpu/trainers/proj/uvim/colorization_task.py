"""Colorization task adapter: inputs, losses, and predictions for UViM.

Behavior parity: reference trainers/proj/uvim/colorization_task.py —
per-patch RGB regression targets, squared error, clipped stitch-back.
"""

from __future__ import annotations

import jax.numpy as jnp

from big_vision_tpu.trainers.proj.uvim import tasklib

ONE_HOT_AXIS = tasklib.CLASS_AXIS


def input_pp(batch, config):
  targets = None
  if "labels" in batch:
    targets = {"color": tasklib.patchify_channels(batch["labels"],
                                                  config.model.patch_size)}
  return {"ctx": tasklib.context_of(batch), "x": targets}


def loss_fn(logits, batch, config):
  target = input_pp(batch, config)["x"]["color"]
  err = jnp.square(logits["color"] - target)
  return err, {"loss_color": err}


def predict_outputs(logits, config):
  assert ONE_HOT_AXIS == -2, "unpatchify assumes channels at axis -2"
  color = tasklib.unpatchify(logits["color"], config)
  return {"color": jnp.clip(color, -1.0, 1.0)}
