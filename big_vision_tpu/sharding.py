"""Parameter-sharding strategies: regex rules -> NamedSharding pytrees.

A strategy is `[(regex, "tactic|tactic"), ...]`; each tactic is a registry
spec under "shardings." (replicate / fsdp / logical_partitioning /
shard_dim). First matching regex wins per parameter. Parity target:
reference big_vision/sharding.py:38-197; GSPMD then inserts all collectives
from these annotations.

Design notes (internals differ from the reference):
- One flat pass: leaves are flattened with names once, the winning rule is
  resolved per leaf inline, and specs never exist as a pytree of tuples —
  the reference instead builds per-pattern boolean mask trees and runs one
  whole-tree `tree_map` per tactic op.
- Specs are always plain tuples; flax partitioning boxes (nn.Partitioned /
  nn.LogicallyPartitioned) stay on the params side, and rules that care
  (logical_partitioning) read the axis names off the boxed leaf directly.
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


def _occupy(spec, dim, axis, pname, rule):
  """Writes `axis` into slot `dim` of a spec tuple; the slot must be free."""
  if spec[dim] is not None:
    raise ValueError(f"{rule}: dim {dim} of {pname} is taken: {spec}")
  out = list(spec)
  out[dim] = axis
  return tuple(out)


def infer_sharding(params, strategy, mesh):
  """Returns a NamedSharding pytree for `params` under `strategy`.

  `params` may contain nn.LogicallyPartitioned / nn.Partitioned boxed leaves
  (from eval_shape over a model with logical annotations); the result is an
  unboxed pytree of NamedShardings.
  """
  rules = [
      (trees.check_and_compile_patterns(pat)[0],
       [Registry.lookup(f"shardings.{s}")() for s in tactic.split("|")])
      for pat, tactic in strategy]

  # Names come from the unboxed view (boxes are pytree nodes and would leak
  # into paths); leaves keep their boxes so rules can read annotations.
  plain = jax.tree.map(_raw, params, is_leaf=_is_boxed)
  named, treedef = trees.tree_flatten_with_names(plain)
  leaves = jax.tree.leaves(params, is_leaf=_is_boxed)

  def resolve(pname, leaf, arr):
    spec = (None,) * np.ndim(arr)
    for pattern, ops in rules:
      if not pattern.fullmatch(pname):
        continue
      for op in ops:
        spec = op(spec, mesh, pname, leaf)
      break  # each leaf is claimed by its first matching pattern only
    return NamedSharding(mesh, P(*spec))

  return treedef.unflatten(
      [resolve(pname, leaf, arr)
       for (pname, arr), leaf in zip(named, leaves)])


@Registry.register("shardings.replicate")
def replicate():
  """Explicit full replication (also the default for unmatched params)."""
  def _update(cur_spec, mesh, name, x):
    del x, mesh
    if any(axis is not None for axis in cur_spec):
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
  mesh_axes = (axis,) if isinstance(axis, str) else tuple(axis)
  label = axis if isinstance(axis, str) else tuple(axis)

  def _update(cur_spec, mesh, name, x):
    arr = _raw(x)
    shape = arr.shape
    if np.prod(shape) * arr.dtype.itemsize <= min_size_to_shard_mb * 2**20:
      return cur_spec
    ways = int(np.prod([mesh.shape[a] for a in mesh_axes]))
    # Largest dim first; among equal sizes the rightmost dim wins (matches
    # the reference's reversed-argsort order so layouts stay comparable).
    ranked = sorted(range(len(shape)), key=lambda i: (shape[i], i))[::-1]
    dim = next((i for i in ranked
                if shape[i] % ways == 0 and cur_spec[i] is None), None)
    if dim is None:
      return cur_spec  # nothing divisible & free: stays as-is
    return _occupy(cur_spec, dim, label, name, "fsdp")
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
    ndim = len(cur_spec)
    if not -ndim < dim < ndim:
      if ignore_ndim_error:
        return cur_spec
      raise ValueError(
          f"shard_dim({axis},{dim}): {name} has spec {cur_spec}")
    return _occupy(cur_spec, dim % ndim, axis, name, f"shard_dim({axis})")
  return _update
