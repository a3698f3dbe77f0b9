import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import big_vision_tpu.sharding as bv_sharding
import big_vision_tpu.utils as u

P = jax.sharding.PartitionSpec


@pytest.fixture(scope="module")
def mesh():
  return u.create_device_mesh([("data", -1)])


@pytest.fixture(scope="module")
def mesh2d():
  return u.create_device_mesh([("data", 2), ("model", 4)])


def params_tree():
  return {
      "big": jnp.zeros((1024, 4096)),   # 16 MiB
      "tall": jnp.zeros((4097, 512)),   # dim0 not divisible by 8
      "small": jnp.zeros((16, 16)),
      "nested": {"w": jnp.zeros((2048, 1024))},
  }


def spec_of(shardings, name):
  return u.tree_get(shardings, name).spec


def test_replicate(mesh):
  sh = bv_sharding.infer_sharding(params_tree(), [(".*", "replicate")], mesh)
  for name in ["big", "tall", "small", "nested/w"]:
    assert spec_of(sh, name) == P(None, None)


def test_fsdp_shards_largest_divisible_dim(mesh):
  sh = bv_sharding.infer_sharding(params_tree(), [(".*", "fsdp(axis='data')")],
                                  mesh)
  assert spec_of(sh, "big") == P(None, "data")      # 4096 largest
  assert spec_of(sh, "tall") == P(None, "data")     # 4097 not divisible -> 512
  assert spec_of(sh, "small") == P(None, None)      # too small
  assert spec_of(sh, "nested/w") == P("data", None)


def test_fsdp_min_size(mesh):
  sh = bv_sharding.infer_sharding(
      params_tree(), [(".*", "fsdp(axis='data', min_size_to_shard_mb=0)")],
      mesh)
  # Square shape: argsort-descending visits the last dim first.
  assert spec_of(sh, "small") == P(None, "data")


def test_first_match_wins(mesh):
  sh = bv_sharding.infer_sharding(
      params_tree(),
      [("big", "replicate"), (".*", "fsdp(axis='data')")], mesh)
  assert spec_of(sh, "big") == P(None, None)
  assert spec_of(sh, "nested/w") == P("data", None)


def test_shard_dim(mesh2d):
  sh = bv_sharding.infer_sharding(
      params_tree(),
      [("big", "shard_dim(axis='model', dim=1)|shard_dim(axis='data', dim=0)"),
       (".*", "replicate")], mesh2d)
  assert spec_of(sh, "big") == P("data", "model")


def test_shard_dim_conflict_raises(mesh2d):
  with pytest.raises(ValueError):
    bv_sharding.infer_sharding(
        params_tree(),
        [("big", "shard_dim(axis='model', dim=1)|shard_dim(axis='data', dim=1)")],
        mesh2d)


def test_shard_dim_ndim_error(mesh2d):
  with pytest.raises(ValueError):
    bv_sharding.infer_sharding(
        {"v": jnp.zeros((8,))}, [(".*", "shard_dim(axis='data', dim=1)")],
        mesh2d)
  sh = bv_sharding.infer_sharding(
      {"v": jnp.zeros((8,))},
      [(".*", "shard_dim(axis='data', dim=1, ignore_ndim_error=True)")],
      mesh2d)
  assert spec_of(sh, "v") == P(None)


class TinyTP(nn.Module):
  @nn.compact
  def __call__(self, x):
    w = self.param(
        "w",
        nn.with_logical_partitioning(
            nn.initializers.zeros_init(), ("embed", "mlp")),
        (x.shape[-1], 32), jnp.float32)
    return x @ w


def test_logical_partitioning(mesh2d):
  model = TinyTP()
  with nn.logical_axis_rules([("embed", None), ("mlp", "model")]):
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 16)))
    sh = bv_sharding.infer_sharding(
        shapes, [(".*", "logical_partitioning")], mesh2d)
  assert spec_of(sh, "params/w") == P(None, "model")


def test_fsdp_end_to_end_reshard(mesh):
  """Shardings actually place arrays: check shard shapes on 8 devices."""
  params = params_tree()
  sh = bv_sharding.infer_sharding(params, [(".*", "fsdp(axis='data')")], mesh)
  placed = u.reshard(params, sh)
  shard = placed["big"].addressable_shards[0]
  assert shard.data.shape == (1024, 4096 // 8)
