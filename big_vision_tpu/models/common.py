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

  def should_merge(name):
    return not any(p.fullmatch(name) for p in patterns)

  loaded_flat = dict(u.tree_flatten_with_names(loaded)[0])
  inited_flat = dict(u.tree_flatten_with_names(inited)[0])

  merged = {}
  for name, init_val in inited_flat.items():
    if name in loaded_flat and should_merge(name):
      merged[name] = loaded_flat[name]
      if match_dtype:
        merged[name] = merged[name].astype(init_val.dtype)
    else:
      merged[name] = init_val

  only_inited = {k for k in inited_flat.keys() - loaded_flat.keys()
                 if should_merge(k)}
  only_loaded = {k for k in loaded_flat.keys() - inited_flat.keys()
                 if should_merge(k)}
  if only_inited or only_loaded:
    def fmt(title, keys, mark):
      return f"{title}:\n" + "\n".join(f" {mark} {k}" for k in sorted(keys))
    raise ValueError(
        "Checkpoint/model structure mismatch not covered by dont_load.\n"
        + fmt("In model but not checkpoint", only_inited, "-") + "\n"
        + fmt("In checkpoint but not model", only_loaded, "+"))

  return u.recover_tree(merged.keys(), merged.values())


class AddPositionEmbs(nn.Module):
  """Adds posemb to inputs; single-position cache mode for AR decode."""
  decode: bool = False

  @nn.compact
  def __call__(self, inputs, posemb):
    assert inputs.ndim == 3, f"Bad inputs shape: {inputs.shape}"
    _, seq_len, emb_dim = inputs.shape
    pe = posemb[:, :seq_len, :]
    if self.decode:
      is_initialized = self.has_variable("cache", "cache_index")
      cache_index = self.variable(
          "cache", "cache_index", lambda: jnp.array(0, dtype=jnp.uint32))
      if is_initialized:
        i = cache_index.value
        cache_index.value = i + 1
        pe = jax.lax.dynamic_slice(
            posemb, (jnp.int32(0), i.astype(jnp.int32), jnp.int32(0)),
            (1, 1, emb_dim))
    return inputs + pe
