"""Utils shared by the GIVT stage-I and stage-II trainers.

Parity target: reference trainers/proj/givt/utils.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def unbin_depth(depth, *, min_depth, max_depth, num_bins):
  """One-hot-binned depth map -> float depth (inverse of bin_nyu_depth)."""
  depth = jnp.argmax(depth, axis=-1)
  depth = depth.astype(jnp.float32) + 0.5  # Undo floor in expectation.
  depth /= num_bins
  return depth * (max_depth - min_depth) + min_depth


def get_local_rng(seed: int | jax.Array, batch: Any) -> jax.Array:
  """Per-image rng key folded from image ids (or image means as fallback)."""
  fake_id = None
  if "image" in batch:
    fake_id = (10 ** 6 * jax.vmap(jnp.mean)(batch["image"])).astype(
        jnp.int32)
  return jax.lax.scan(
      lambda k, x: (jax.random.fold_in(k, x), None),
      jax.random.PRNGKey(seed),
      batch.get("image/id", fake_id))[0]
