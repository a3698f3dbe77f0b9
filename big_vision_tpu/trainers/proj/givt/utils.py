"""Utils shared by the GIVT stage-I and stage-II trainers.

Behavior parity: reference trainers/proj/givt/utils.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def unbin_depth(depth, *, min_depth, max_depth, num_bins):
  """One-hot-binned depth map -> float depth (inverse of bin_nyu_depth).

  Reads out each bin's CENTER (the +0.5), undoing the binning floor in
  expectation.
  """
  centers = jnp.linspace(min_depth, max_depth, num_bins, endpoint=False,
                         dtype=jnp.float32)
  centers = centers + 0.5 * (max_depth - min_depth) / num_bins
  return jnp.take(centers, jnp.argmax(depth, axis=-1))


def get_local_rng(seed: int | jax.Array, batch: Any) -> jax.Array:
  """Single rng key deterministically tied to the batch's image ids.

  Sequentially folds every id into PRNGKey(seed), so the key depends on
  the data content, not the step. Batches without an "image/id" field get
  pseudo-ids hashed from the image means (same fallback as the reference).
  """
  ids = batch.get("image/id")
  if ids is None and "image" in batch:
    ids = (1e6 * jax.vmap(jnp.mean)(batch["image"])).astype(jnp.int32)

  def absorb(i, key):
    return jax.random.fold_in(key, ids[i])

  return jax.lax.fori_loop(0, len(ids), absorb, jax.random.PRNGKey(seed))
