"""Device mesh, resharding, and the host->HBM global-array feed.

This is the SPMD backbone: every array in the trainer is a global jax.Array
over a `jax.sharding.Mesh`; this module creates the mesh (ICI-aware ordering)
and moves host data onto it. Parity: reference big_vision/utils.py:1317-1478.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils

__all__ = [
    "create_device_mesh", "reshard", "put_cpu", "sync", "ambient_mesh",
    "make_fsarray_from_local_slice", "get_local_slice_from_fsarray",
    "assert_local_slices_same",
]

from big_vision_tpu.utils.trees import tree_broadcast


def create_device_mesh(config_mesh, *, devices=None,
                       allow_split_physical_axes=False):
  """Builds a Mesh from [("axis", size), ...]; -1 sizes are inferred.

  Axes should be ordered slowest-to-fastest interconnect so collectives on
  the last axis ride the fastest links (ICI).
  """
  devices = devices if devices is not None else jax.devices()
  axis_names, axis_sizes = zip(*config_mesh)
  axis_sizes = np.asarray(devices).reshape(axis_sizes).shape  # resolve -1
  device_grid = mesh_utils.create_device_mesh(
      axis_sizes, devices=devices,
      allow_split_physical_axes=allow_split_physical_axes)
  return jax.sharding.Mesh(device_grid, axis_names)


def ambient_mesh():
  """The mesh in effect at the call site, or None.

  Checks, in order: the explicit-sharding abstract mesh (inside jit under
  sharding-in-types), the `jax.sharding.set_mesh` mesh, and the legacy
  `with mesh:` context (which still lives in jax's internal thread
  resources — read via the private module to avoid the deprecated
  `jax.interpreters.pxla` shim).
  """
  mesh = jax.sharding.get_abstract_mesh()
  if mesh is not None and not mesh.empty:
    return mesh
  try:
    mesh = jax.sharding.get_mesh()
    if mesh is not None and not mesh.empty:
      return mesh
  except ValueError:
    pass  # get_mesh raises inside jit; the legacy context below still works
  try:
    from jax._src import mesh as _mesh_lib  # pylint: disable=g-import-not-at-top
    mesh = _mesh_lib.thread_resources.env.physical_mesh
    return None if mesh.empty else mesh
  except Exception:  # pylint: disable=broad-except
    return None


def put_cpu(x):
  """Pins a pytree to host CPU device zero (for keep-on-cpu batch keys)."""
  return jax.device_put(x, jax.local_devices(backend="cpu")[0])


def reshard(tree, shardings):
  """Re-lays-out a pytree onto target shardings; no-op where already right.

  Fully-addressable arrays (host/numpy) are assumed replicated across
  processes; each process places its devices' shards directly.
  """
  def _to_global(x, sharding, shape):
    if hasattr(x, "sharding") and x.sharding.is_equivalent_to(
        sharding, len(shape)):
      return x
    if not getattr(x, "is_fully_addressable", True):
      raise RuntimeError(
          "reshard() got a non-fully-addressable array with a different "
          "sharding; resharding it would need a device-side collective. "
          "Use jax.device_put inside jit instead.")
    x = jax.device_get(x)
    shards = [
        jax.device_put(x[idx], device=d)
        for d, idx in sharding.addressable_devices_indices_map(shape).items()
    ]
    return jax.make_array_from_single_device_arrays(shape, sharding, shards)

  shapes = jax.tree.map(np.shape, tree)
  shardings = tree_broadcast(shardings, tree)
  return jax.tree.map(_to_global, tree, shardings, shapes)


def make_fsarray_from_local_slice(local_slice, global_devices):
  """Host-local batch slice -> global array sharded over all devices.

  The leading axis is split evenly over this host's devices; together with
  every other host doing the same, the result is the global batch. This is
  the per-step host->HBM boundary of the input pipeline.
  """
  mesh = jax.sharding.Mesh(global_devices, ("devices",))
  sharding = jax.sharding.NamedSharding(
      mesh, jax.sharding.PartitionSpec("devices"))
  local_devices = mesh.local_devices

  x = np.asarray(memoryview(local_slice))  # zero-copy view where possible
  shards = jax.device_put(np.split(x, len(local_devices), axis=0),
                          local_devices)
  global_shape = (x.shape[0] * jax.process_count(), *x.shape[1:])
  return jax.make_array_from_single_device_arrays(
      global_shape, sharding, shards)


def get_local_slice_from_fsarray(global_array):
  """Inverse of make_fsarray_from_local_slice: this host's rows as numpy."""
  if not isinstance(global_array, jax.Array):
    return np.asarray(global_array)
  if not hasattr(global_array.sharding, "mesh"):
    # Single-device / replicated arrays (common in tests and single-chip
    # runs): the whole array IS the local slice.
    assert global_array.is_fully_addressable
    return jax.device_get(global_array)
  for shard in global_array.addressable_shards:
    assert all(idx == slice(None) for idx in shard.index[1:]), (
        f"Only leading-axis sharding supported, got {shard.index}")
  by_device = {s.device: s for s in global_array.addressable_shards}
  ordered = [by_device[d] for d in global_array.sharding.mesh.local_devices]
  return np.concatenate([jax.device_get(s.data) for s in ordered], axis=0)


def assert_local_slices_same(*global_arrays):
  slices = [
      tuple(tuple((i.start, i.stop, i.step) for i in s.index)
            for s in a.addressable_shards)
      for a in global_arrays]
  assert len(set(slices)) == 1, f"Inconsistent local slices: {slices}"


def sync():
  """Cross-host barrier: one tiny all-device reduction, blocked on."""
  x = reshard(
      np.ones(jax.device_count(), np.float32),
      jax.sharding.NamedSharding(
          jax.sharding.Mesh(jax.devices(), ("d",)),
          jax.sharding.PartitionSpec("d")))
  jax.jit(lambda v: v.sum())(x).block_until_ready()
