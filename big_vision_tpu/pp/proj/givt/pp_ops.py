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
  """Quantizes metric NYU depth into `num_bins` integer classes (ref :22).

  Out-of-range depths clamp to the first/last bin, matching the reference's
  floor-then-min/max TF formulation.
  """
  inv_range = float(num_bins) / (max_depth - min_depth)

  def _quantize(depth):
    idx = jnp.floor((jnp.asarray(depth, jnp.float32) - min_depth) * inv_range)
    return jnp.clip(idx, 0, num_bins - 1).astype(jnp.int32)

  return _quantize
