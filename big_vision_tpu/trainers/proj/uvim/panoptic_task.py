"""Panoptic task adapter: inputs, losses, and predictions for UViM.

Parity target: reference trainers/proj/uvim/panoptic_task.py.
"""

from __future__ import annotations

import einops
import jax
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.utils as u

ONE_HOT_AXIS = -2


def input_pp(batch, config):
  """(B,H,W,2) labels -> per-patch one-hot semantics/instances dicts."""
  if "labels" not in batch:
    x = None  # Phase-II predict has no labels.
  else:
    hp, wp = config.model.patch_size
    x = {"semantics": batch["labels"][..., 0],
         "instances": batch["labels"][..., 1]}
    for key in ("semantics", "instances"):
      x[key] = jax.nn.one_hot(
          einops.rearrange(
              x[key], "b (hn hp) (wn wp) -> b (hn wn) (hp wp)",
              hp=hp, wp=wp).astype(jnp.int32),
          num_classes=config.model.inputs[key][ONE_HOT_AXIS],
          axis=ONE_HOT_AXIS)
  ctx = batch.get("image_ctx", batch.get("image", None))
  return {"ctx": ctx, "x": x}


def loss_fn(logits, batch, config):
  labels = input_pp(batch, config)["x"]
  losses = {}
  for key in ("semantics", "instances"):
    losses[f"loss_{key}"] = u.softmax_xent(
        logits=logits[key], labels=labels[key], reduction=False,
        axis=ONE_HOT_AXIS)
  return sum(losses.values()), losses


def predict_outputs(logits, config, min_fraction=0.0):
  """Patch logits -> (B, H, W, 2) panoptic map."""
  hp, wp = config.model.patch_size
  hn, wn = np.array(config.model.input_size) // np.array((hp, wp))
  outputs = {}
  for key in ("semantics", "instances"):
    assert ONE_HOT_AXIS == -2, "Rearrange below depends on this."
    outputs[key] = einops.rearrange(
        logits[key], "b (hn wn) c (hp wp) -> b (hn hp) (wn wp) c",
        hn=hn, wn=wn, hp=hp, wp=wp)
  return panoptic_predictions_from_logits(**outputs,
                                          min_fraction=min_fraction)


def panoptic_predictions_from_logits(semantics, instances,
                                     min_fraction=0.0):
  """Argmax instances, then majority-vote one semantic label per segment."""
  ins = jnp.argmax(instances, axis=-1)
  masks = jax.nn.one_hot(ins, instances.shape[-1], dtype=jnp.int32)
  label = jnp.argmax(jnp.einsum("bhwk,bhwn->bnk", semantics, masks), -1)
  sem = jnp.einsum("bhwn,bn->bhw", masks, label)
  out = jnp.stack([sem, ins], axis=-1)
  # Zero out segments below the minimum area fraction.
  fraction = (jnp.sum(masks, axis=(1, 2), keepdims=True)
              / np.prod(ins.shape[1:3]))
  mask_big = (fraction > min_fraction).astype("int32")
  big_spatial = jnp.sum(masks * mask_big, axis=-1, keepdims=True) > 0
  return out * big_spatial.astype("int32")
