"""Utils shared by the GIVT stage-I and stage-II trainers.

Behavior parity: reference trainers/proj/givt/utils.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def unbin_depth(depth, *, min_depth, max_depth, num_bins):
  """One-hot-binned depth map -> float depth (inverse of bin_nyu_depth).

  The +0.5 reads out each bin's center, undoing the binning floor in
  expectation.
  """
  centers = (jnp.argmax(depth, axis=-1).astype(jnp.float32) + 0.5) / num_bins
  return min_depth + centers * (max_depth - min_depth)


def get_local_rng(seed: int | jax.Array, batch: Any) -> jax.Array:
  """Single rng key derived from the batch's image ids.

  Falls back to pseudo-ids hashed from image means when the batch carries
  no "image/id" field, so augmentation randomness is still tied to the
  data rather than the step.
  """
  ids = batch.get("image/id")
  if ids is None and "image" in batch:
    ids = (1e6 * jax.vmap(jnp.mean)(batch["image"])).astype(jnp.int32)
  fold = lambda key, i: (jax.random.fold_in(key, i), None)
  return jax.lax.scan(fold, jax.random.PRNGKey(seed), ids)[0]
