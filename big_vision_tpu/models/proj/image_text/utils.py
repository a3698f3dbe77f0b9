"""Image-text model utilities: communication-free batch sharding helpers.

Parity target: reference models/proj/image_text/utils.py. `batch_shmap`
maps a function over the data axis of the ambient mesh with shard_map so
per-shard ops (like subsampling) never trigger collectives.
"""

from __future__ import annotations

import jax
from jax import shard_map as _shard_map

P = jax.sharding.PartitionSpec


def _ambient_mesh():
  from big_vision_tpu.utils.mesh import ambient_mesh
  return ambient_mesh()


def batch_shmap(fn, *args, **kwargs):
  """Maps `fn` along the data dimension without communication."""
  mesh = _ambient_mesh()
  if mesh is not None and not isinstance(
      mesh, jax.sharding.AbstractMesh):
    devices_flat = mesh.devices.flatten()
    mesh_flat = jax.sharding.Mesh(devices_flat, ("data",))
    fn = _shard_map(fn, mesh=mesh_flat, in_specs=P("data"),
                    out_specs=P("data"))
  return fn(*args, **kwargs)


def subsample_batch(x, subsample: int):
  """Takes every `subsample`-th example, per shard (no cross-device comms)."""
  fn = lambda x: jax.tree.map(lambda xx: xx[::subsample], x)
  return batch_shmap(fn, x) if subsample > 1 else x
