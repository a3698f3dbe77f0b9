"""Depth task adapter: inputs, losses, and predictions for UViM.

Parity target: reference trainers/proj/uvim/depth_task.py.
"""

from __future__ import annotations

import einops
import jax
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.utils as u

ONE_HOT_AXIS = -2


def input_pp(batch, config):
  """Bins float depth into per-patch one-hot class targets."""
  if "labels" not in batch:
    x = None
  else:
    hp, wp = config.model.patch_size
    depth = batch["labels"][..., 0]

    nbins = config.model.inputs.depth[ONE_HOT_AXIS]
    mind, maxd = config.min_depth, config.max_depth
    depth = (depth - mind) / (maxd - mind)
    depth = jnp.clip(jnp.floor(depth * nbins).astype(jnp.int32), 0,
                     nbins - 1)

    depth = jax.nn.one_hot(
        einops.rearrange(
            depth, "b (hn hp) (wn wp) -> b (hn wn) (hp wp)",
            hp=hp, wp=wp),
        num_classes=nbins, axis=ONE_HOT_AXIS)
    x = {"depth": depth}
  ctx = batch.get("image_ctx", batch.get("image", None))
  return {"ctx": ctx, "x": x}


def loss_fn(predictions, batch, config):
  labels = input_pp(batch, config)["x"]
  loss = u.softmax_xent(
      logits=predictions["depth"], labels=labels["depth"],
      reduction=False, axis=ONE_HOT_AXIS)
  # Class 0 is "no depth signal" - do not train on it.
  mask = jnp.argmax(labels["depth"], ONE_HOT_AXIS) != 0
  loss = loss * mask
  return loss, {"loss_depth": loss}


def predict_outputs(predictions, config):
  """Patch logits -> float depth map (inverse binning)."""
  hp, wp = config.model.patch_size
  hn, wn = np.array(config.model.input_size) // np.array((hp, wp))
  depth = einops.rearrange(
      predictions["depth"], "b (hn wn) c (hp wp) -> b (hn hp) (wn wp) c",
      hn=hn, wn=wn, hp=hp, wp=wp)
  depth = jnp.argmax(depth, axis=-1)

  nbins = config.model.inputs.depth[ONE_HOT_AXIS]
  mind, maxd = config.min_depth, config.max_depth
  depth = depth.astype(jnp.float32) + 0.5  # Undo floor in expectation.
  depth /= nbins
  return {"depth": depth * (maxd - mind) + mind}
