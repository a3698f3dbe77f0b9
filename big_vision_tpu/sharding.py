"""Parameter-sharding strategies: regex rules -> NamedSharding pytrees.

A strategy is `[(regex, "tactic|tactic"), ...]`; each tactic is a registry
spec under "shardings." (replicate / fsdp / logical_partitioning /
shard_dim). First matching regex wins per parameter. Parity target:
reference big_vision/sharding.py:38-197; GSPMD then inserts all collectives
from these annotations.

Design note (differs from the reference internally): specs are always plain
tuples; flax partitioning boxes (nn.Partitioned / nn.LogicallyPartitioned)
stay on the params side, and rules that care (logical_partitioning) read the
axis names off the boxed leaf directly.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import numpy as np

from big_vision_tpu.registry import Registry
from big_vision_tpu.utils import trees

NamedSharding = jax.sharding.NamedSharding
P = jax.sharding.PartitionSpec

__all__ = ["infer_sharding"]

_BOXES = (nn.Partitioned, nn.LogicallyPartitioned)


def _is_boxed(v):
  return isinstance(v, _BOXES)


def _raw(x):
  """Unboxes a flax partitioning box to the underlying (abstract) array."""
  return x.unbox() if _is_boxed(x) else x


def infer_sharding(params, strategy, mesh):
  """Returns a NamedSharding pytree for `params` under `strategy`.

  `params` may contain nn.LogicallyPartitioned / nn.Partitioned boxed leaves
  (from eval_shape over a model with logical annotations); the result is an
  unboxed pytree of NamedShardings.
  """
  patterns, tactics = zip(*strategy)
  plain = jax.tree.map(_raw, params, is_leaf=_is_boxed)
  named, treedef = trees.tree_flatten_with_names(plain)
  names = treedef.unflatten([n for n, _ in named])
  mask_trees = trees.make_mask_trees(plain, list(patterns))

  # Boxed leaves kept alongside so rules can read logical annotations.
  boxed = jax.tree.map(lambda x: x, params, is_leaf=_is_boxed)
  specs = jax.tree.map(lambda x: (None,) * np.ndim(x), plain)

  for mask_tree, tactic in zip(mask_trees, tactics):
    for op_str in tactic.split("|"):
      op = Registry.lookup(f"shardings.{op_str}")()
      specs = jax.tree.map(
          lambda x, n, match, spec, op=op: (
              op(spec, mesh, n, x) if match else spec),
          boxed, names, mask_tree, specs, is_leaf=_is_boxed)

  return jax.tree.map(lambda spec: NamedSharding(mesh, P(*spec)), specs,
                      is_leaf=lambda s: isinstance(s, tuple))


@Registry.register("shardings.replicate")
def replicate():
  """Explicit full replication (also the default for unmatched params)."""
  def _update(cur_spec, mesh, name, x):
    del x, mesh
    if not all(axis is None for axis in cur_spec):
      raise ValueError(
          f"Parameter {name} already has spec {cur_spec}; can't replicate.")
    return cur_spec
  return _update


@Registry.register("shardings.fsdp")
def fsdp(axis, min_size_to_shard_mb=4):
  """ZeRO-3-style: shard the largest free, divisible dim along `axis`.

  Small tensors (<= min_size_to_shard_mb) stay replicated — the all-gather
  latency would outweigh the memory saved.
  """
  axis_tuple = (axis,) if isinstance(axis, str) else tuple(axis)
  axis = axis if isinstance(axis, str) else tuple(axis)

  def _update(cur_spec, mesh, name, x):
    del name
    x = _raw(x)
    shape = x.shape
    axis_size = np.prod([mesh.shape[a] for a in axis_tuple])
    if np.prod(shape) * x.dtype.itemsize <= min_size_to_shard_mb * 2**20:
      return cur_spec
    for i in np.argsort(shape)[::-1]:  # largest dim first
      if shape[i] % axis_size == 0 and cur_spec[i] is None:
        return cur_spec[:i] + (axis,) + cur_spec[i + 1:]
    return cur_spec  # nothing divisible & free: stays as-is
  return _update


@Registry.register("shardings.logical_partitioning")
def logical_partitioning():
  """Maps model-declared logical axes (nn.with_logical_partitioning) to mesh
  axes via the ambient nn.logical_axis_rules context."""
  def _update(cur_spec, mesh, name, x):
    del name, mesh
    if isinstance(x, nn.LogicallyPartitioned):
      return tuple(nn.logical_to_mesh_axes(x.names))
    if isinstance(x, nn.Partitioned):
      return tuple(x.names)
    return cur_spec
  return _update


@Registry.register("shardings.shard_dim")
def shard_dim(axis, dim, ignore_ndim_error=False):
  """Shards one explicit dimension (negative ok) along `axis`."""
  def _update(cur_spec, mesh, name, x):
    del mesh, x
    if abs(dim) >= len(cur_spec):
      msg = f"shard_dim({axis},{dim}): {name} has spec {cur_spec}"
      if ignore_ndim_error:
        return cur_spec
      raise ValueError(msg)
    pos = dim if dim >= 0 else dim + len(cur_spec)
    if cur_spec[pos] is not None:
      raise ValueError(
          f"shard_dim({axis},{dim}): dim already sharded; {name} {cur_spec}")
    return cur_spec[:pos] + (axis,) + cur_spec[pos + 1:]
  return _update
