"""Utilities shared across models (param surgery, embeddings).

Parity target: reference big_vision/models/common.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

import big_vision_tpu.utils as u


def merge_params(loaded, inited, dont_load=(), match_dtype=False):
  """Reconciles a loaded checkpoint tree with a model-inited tree.

  Keys matched by a `dont_load` regex keep their init value (or are dropped
  if only in the checkpoint). Any other structural mismatch is an error that
  lists the offending keys. Ref: models/common.py:24.
  """
  if inited is None:
    return loaded

  patterns = u.check_and_compile_patterns(dont_load)

  def keep_init(name):
    return any(p.fullmatch(name) for p in patterns)

  have = dict(u.tree_flatten_with_names(loaded)[0])
  want = dict(u.tree_flatten_with_names(inited)[0])

  merged, problems = {}, []
  for name in sorted(set(have) | set(want)):
    if name not in want:
      # Checkpoint-only entry: silently dropped when dont_load'ed.
      if not keep_init(name):
        problems.append(f" + {name}  (in checkpoint, not in model)")
    elif name in have and not keep_init(name):
      val = have[name]
      merged[name] = val.astype(want[name].dtype) if match_dtype else val
    else:
      merged[name] = want[name]
      if name not in have and not keep_init(name):
        problems.append(f" - {name}  (in model, not in checkpoint)")

  if problems:
    raise ValueError(
        "Checkpoint/model structure mismatch not covered by dont_load:\n"
        + "\n".join(problems))

  return u.recover_tree(merged.keys(), merged.values())


class AddPositionEmbs(nn.Module):
  """Adds posemb to inputs; single-position cache mode for AR decode."""
  decode: bool = False

  @nn.compact
  def __call__(self, inputs, posemb):
    assert inputs.ndim == 3, f"Bad inputs shape: {inputs.shape}"
    if self.decode:
      # A cache pointer tracks the current decode position; each call
      # consumes one posemb row. First (init) call falls through to the
      # full-sequence add below.
      started = self.has_variable("cache", "cache_index")
      ptr = self.variable("cache", "cache_index",
                          lambda: jnp.array(0, dtype=jnp.uint32))
      if started:
        pos = ptr.value.astype(jnp.int32)
        ptr.value = ptr.value + 1
        return inputs + jax.lax.dynamic_slice_in_dim(posemb, pos, 1, axis=1)
    return inputs + posemb[:, :inputs.shape[1], :]
