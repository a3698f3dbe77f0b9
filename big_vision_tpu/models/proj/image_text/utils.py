"""Image-text model utilities: communication-free batch sharding helpers.

Parity target: reference models/proj/image_text/utils.py. `batch_shmap`
maps a function over the data axis of the ambient mesh with shard_map so
per-shard ops (like subsampling) never trigger collectives.
"""

from __future__ import annotations

import jax
from jax import shard_map as _shard_map


def batch_shmap(fn, *args, **kwargs):
  """Maps `fn` along the data dimension without communication."""
  from big_vision_tpu.utils.mesh import ambient_mesh
  mesh = ambient_mesh()
  if mesh is None or isinstance(mesh, jax.sharding.AbstractMesh):
    return fn(*args, **kwargs)
  # Flatten whatever mesh shape is ambient into a single "data" axis:
  # shard_map over it touches each shard independently, so any per-shard
  # computation stays collective-free by construction.
  spec = jax.sharding.PartitionSpec("data")
  flat = jax.sharding.Mesh(mesh.devices.reshape(-1), ("data",))
  shmapped = _shard_map(fn, mesh=flat, in_specs=spec, out_specs=spec)
  return shmapped(*args, **kwargs)


def subsample_batch(x, subsample: int):
  """Takes every `subsample`-th example, per shard (no cross-device comms)."""
  if subsample <= 1:
    return x
  take_strided = lambda tree: jax.tree.map(lambda a: a[::subsample], tree)
  return batch_shmap(take_strided, x)
