"""Colorization task adapter: inputs, losses, and predictions for UViM.

Parity target: reference trainers/proj/uvim/colorization_task.py.
"""

from __future__ import annotations

import einops
import jax.numpy as jnp
import numpy as np

ONE_HOT_AXIS = -2


def input_pp(batch, config):
  if "labels" not in batch:
    x = None
  else:
    hp, wp = config.model.patch_size
    x = {"color": einops.rearrange(
        batch["labels"], "b (hn hp) (wn wp) c -> b (hn wn) c (hp wp)",
        hp=hp, wp=wp)}
  ctx = batch.get("image_ctx", batch.get("image", None))
  return {"ctx": ctx, "x": x}


def loss_fn(logits, batch, config):
  labels = input_pp(batch, config)["x"]
  loss = jnp.square(logits["color"] - labels["color"])
  return loss, {"loss_color": loss}


def predict_outputs(logits, config):
  hp, wp = config.model.patch_size
  hn, wn = np.array(config.model.input_size) // np.array((hp, wp))
  assert ONE_HOT_AXIS == -2, "Rearrange below depends on this."
  output = einops.rearrange(
      logits["color"], "b (hn wn) c (hp wp) -> b (hn hp) (wn wp) c",
      hn=hn, wn=wn, hp=hp, wp=wp)
  return {"color": jnp.clip(output, -1.0, 1.0)}
