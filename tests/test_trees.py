import jax
import numpy as np
import pytest

import big_vision_tpu.utils as u


@pytest.fixture
def tree():
  return {
      "a": np.ones(3),
      "b": {"c": np.zeros(2), "d": np.full(4, 2.0)},
  }


def test_flatten_with_names(tree):
  named, treedef = u.tree_flatten_with_names(tree)
  names = [n for n, _ in named]
  assert names == ["a", "b/c", "b/d"]
  rebuilt = treedef.unflatten([v for _, v in named])
  jax.tree.map(np.testing.assert_array_equal, rebuilt, tree)


def test_flatten_matches_jax_order(tree):
  named, _ = u.tree_flatten_with_names(tree)
  jax_leaves = jax.tree.leaves(tree)
  for (_, v), jl in zip(named, jax_leaves):
    np.testing.assert_array_equal(v, jl)


def test_unflatten_roundtrip(tree):
  named, _ = u.tree_flatten_with_names(tree)
  rebuilt = u.tree_unflatten(named)
  assert set(rebuilt) == {"a", "b"}
  np.testing.assert_array_equal(rebuilt["b"]["d"], tree["b"]["d"])


def test_tree_get(tree):
  np.testing.assert_array_equal(u.tree_get(tree, "b/c"), tree["b"]["c"])
  inner = u.tree_get(tree, "b")
  assert set(inner) == {"c", "d"}
  with pytest.raises(KeyError):
    u.tree_get(tree, "b/zzz")


def test_tree_replace():
  tree = {"a": {"b": 2, "c": 3}, "c": 4}
  out = u.tree_replace(tree, {
      "a/b": "a/b/x",
      ".*c": "C",
      "C": "D",
      ".*/c": None,
  })
  assert out == {"D": 4, "a": {"b": {"x": 2}}}


def test_make_mask_trees(tree):
  masks = u.make_mask_trees(tree, ["b/.*", ".*"])
  assert masks[0] == {"a": False, "b": {"c": True, "d": True}}
  assert masks[1] == {"a": True, "b": {"c": False, "d": False}}
  # First-match-wins: a leaf is True in at most one mask.
  both = jax.tree.map(lambda *ms: sum(ms), *masks)
  assert all(v == 1 for v in jax.tree.leaves(both))


def test_tree_map_with_regex(tree):
  out = u.tree_map_with_regex(
      lambda v, mult: v * mult, tree, [("b/.*", 10.0)], not_f=lambda v: v * 0)
  np.testing.assert_array_equal(out["a"], np.zeros(3))
  np.testing.assert_array_equal(out["b"]["d"], np.full(4, 20.0))


def test_tree_filter():
  tree = {"x": {"a": 1, "b": 2}, "y": 3}
  mask = {"x": {"a": True, "b": False}, "y": True}
  assert u.tree_filter(tree, mask) == {"x": {"a": 1}, "y": 3}


def test_tree_broadcast():
  prefix = {"x": 10, "y": 20}
  target = {"x": {"a": 1, "b": 2}, "y": 3}
  assert u.tree_broadcast(prefix, target) == {"x": {"a": 10, "b": 10}, "y": 20}


def test_tree_compare():
  t1 = {"a": np.zeros(2, np.float32), "b": np.zeros(3)}
  t2 = {"a": np.zeros(2, np.int32), "c": np.zeros(1)}
  only1, only2, mism = u.tree_compare(t1, t2)
  assert only1 == {"b"} and only2 == {"c"}
  assert "a" in mism


def test_recover_dtype():
  x = np.asarray(jax.numpy.bfloat16(1.5))
  void = x.view(np.dtype("V2"))
  back = u.recover_dtype(void)
  assert back.dtype == jax.numpy.bfloat16.dtype
