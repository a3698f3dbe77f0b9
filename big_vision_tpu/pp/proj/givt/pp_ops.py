"""GIVT-specific preprocessing ops.

Parity target: reference pp/proj/givt/pp_ops.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from big_vision_tpu.registry import Registry
from big_vision_tpu.pp.utils import InKeyOutKey, as_pp_op


@Registry.register("preprocess_ops.bin_nyu_depth")
@as_pp_op()
@InKeyOutKey(indefault="labels", outdefault="labels")
def get_bin_nyu_depth(min_depth=0.001, max_depth=10.0, num_bins=256):
  """Bins NYU depth values into integer classes (ref :22)."""
  def _bin_depth(labels):
    labels = (jnp.asarray(labels, jnp.float32) - min_depth) / (
        max_depth - min_depth)
    labels = jnp.floor(labels * num_bins).astype(jnp.int32)
    return jnp.clip(labels, 0, num_bins - 1)
  return _bin_depth
