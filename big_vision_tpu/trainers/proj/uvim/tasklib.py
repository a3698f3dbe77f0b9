"""Shared patching / one-hot helpers for the UViM task adapters.

The panoptic, depth, and colorization adapters all speak the same dialect:
dense (B,H,W,...) label maps are cut into non-overlapping patches, flattened
to (B, n_patches, [classes,] patch_pixels), and predictions are stitched
back. The class axis sits at -2 so the per-pixel dimension stays innermost
(contiguous) for the model's per-patch heads.
"""

from __future__ import annotations

import einops
import jax
import jax.numpy as jnp

# Position of the one-hot class axis in model inputs/logits.
CLASS_AXIS = -2


def context_of(batch):
  """The conditioning image: `image_ctx` when present, else `image`."""
  return batch.get("image_ctx", batch.get("image", None))


def grid_shape(config):
  """(patches per column, patches per row) from the model config."""
  (hp, wp), (h, w) = config.model.patch_size, config.model.input_size
  return h // hp, w // wp


def patchify(dense, patch_size):
  """(B, H, W) -> (B, n_patches, patch_pixels)."""
  hp, wp = patch_size
  return einops.rearrange(dense, "b (hn hp) (wn wp) -> b (hn wn) (hp wp)",
                          hp=hp, wp=wp)


def patchify_channels(dense, patch_size):
  """(B, H, W, C) -> (B, n_patches, C, patch_pixels)."""
  hp, wp = patch_size
  return einops.rearrange(dense,
                          "b (hn hp) (wn wp) c -> b (hn wn) c (hp wp)",
                          hp=hp, wp=wp)


def patch_one_hot(labels, patch_size, num_classes):
  """Integer (B, H, W) labels -> (B, n_patches, classes, patch_pixels)."""
  flat = patchify(labels.astype(jnp.int32), patch_size)
  return jax.nn.one_hot(flat, num_classes, axis=CLASS_AXIS)


def unpatchify(tokens, config):
  """(B, n_patches, C, patch_pixels) -> dense (B, H, W, C)."""
  hn, wn = grid_shape(config)
  hp, wp = config.model.patch_size
  return einops.rearrange(tokens,
                          "b (hn wn) c (hp wp) -> b (hn hp) (wn wp) c",
                          hn=hn, wn=wn, hp=hp, wp=wp)
