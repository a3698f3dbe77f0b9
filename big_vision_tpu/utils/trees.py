"""Name-addressed pytree utilities.

Every parameter/optimizer tree in the framework is addressable by flat
slash-joined names ("encoder/block0/mlp/kernel"). Regex rules over these names
drive optimizer masking, sharding inference, freezing and checkpoint surgery.
Semantics mirror the reference (`big_vision/utils.py:615-862`), implementation
is fresh.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Callable, Mapping

import flax
import jax
import numpy as np

__all__ = [
    "tree_flatten_with_names", "tree_unflatten", "tree_map_with_names",
    "tree_map_with_regex", "tree_get", "tree_replace", "tree_compare",
    "tree_filter", "tree_broadcast", "make_mask_trees",
    "check_and_compile_patterns", "recover_tree", "recover_dtype",
]


def _named_leaves(tree, with_inner=False):
  """Yields (slash-name, value) via deterministic sorted-key traversal."""
  if dataclasses.is_dataclass(tree):
    tree = flax.serialization.to_state_dict(tree)
  if tree is None:
    return
  if isinstance(tree, Mapping):
    for k in sorted(tree.keys()):
      for sub, v in _named_leaves(tree[k], with_inner):
        yield f"{k}/{sub}".rstrip("/"), v
    if with_inner:
      yield "", tree
  elif isinstance(tree, (list, tuple)):
    for i, item in enumerate(tree):
      for sub, v in _named_leaves(item, with_inner):
        yield f"{i}/{sub}".rstrip("/"), v
    if with_inner:
      yield "", tree
  else:
    yield "", tree


def tree_flatten_with_names(tree):
  """Like jax.tree.flatten but returns ([(name, leaf), ...], treedef).

  Name order follows our sorted-key traversal; leaf order follows jax's
  flatten order so `treedef.unflatten` round-trips.
  """
  leaves, treedef = jax.tree.flatten(tree)
  # Trace jax's traversal order with integer tokens, then align our named
  # traversal onto it (ref utils.py:642-667 uses the same alignment trick).
  token_tree = treedef.unflatten(list(range(len(leaves))))
  names, jax_positions = zip(*_named_leaves(token_tree)) if leaves else ((), ())
  assert len(names) == len(leaves), (len(names), len(leaves))
  order = np.argsort(jax_positions) if leaves else []
  return [(names[i], leaves[jax_positions[i]]) for i in order], treedef


def recover_tree(keys, values):
  """Builds a nested dict from flat slash-joined keys."""
  out: dict[str, Any] = {}
  sub: dict[str, tuple[list, list]] = {}
  for k, v in zip(keys, values):
    if "/" not in k:
      out[k] = v
    else:
      head, rest = k.split("/", 1)
      sub.setdefault(head, ([], []))
      sub[head][0].append(rest)
      sub[head][1].append(v)
  for head, (ks, vs) in sub.items():
    out[head] = recover_tree(ks, vs)
  return out


def tree_unflatten(names_and_vals):
  """Inverse of `tree_flatten_with_names(tree)[0]` (as a nested dict)."""
  names_and_vals = list(names_and_vals)
  return recover_tree([n for n, _ in names_and_vals],
                      [v for _, v in names_and_vals])


def tree_map_with_names(fn: Callable, tree, *rest):
  """jax.tree.map where `fn` additionally receives the flat leaf name."""
  named, treedef = tree_flatten_with_names(tree)
  rest_leaves = [[v for _, v in tree_flatten_with_names(t)[0]] for t in rest]
  new_leaves = [
      fn(name, val, *(r[i] for r in rest_leaves))
      for i, (name, val) in enumerate(named)
  ]
  return treedef.unflatten(new_leaves)


def check_and_compile_patterns(patterns):
  """Compiles a pattern or list of patterns; rejects leading slashes."""
  if isinstance(patterns, str):
    patterns = [patterns]
  assert isinstance(patterns, (list, tuple)), patterns
  for p in patterns:
    assert not p.startswith("/"), f"Param names never start with '/': {p!r}"
  return [re.compile(p) for p in patterns]


def tree_map_with_regex(fn, tree, regex_rules, not_f=lambda x: x, name=None):
  """Applies `fn(leaf, arg)` to leaves whose name fullmatches a rule.

  `regex_rules` is [(pattern, arg), ...]; first matching rule wins, unmatched
  leaves go through `not_f`.
  """
  del name  # Logging hook kept for API parity; metrics writer logs instead.
  compiled = [(re.compile(p), arg) for p, arg in regex_rules]

  def _apply(leaf_name, v):
    for pat, arg in compiled:
      if pat.fullmatch(leaf_name):
        return fn(v, arg)
    return not_f(v)

  return tree_map_with_names(_apply, tree)


def make_mask_trees(tree, patterns, *, log=None):
  """One boolean mask tree per pattern; each leaf True in at most one mask."""
  del log
  compiled = check_and_compile_patterns(patterns)

  def first_match(name, _):
    hits = []
    for pat in compiled:
      hits.append(not any(hits) and bool(pat.fullmatch(name)))
    return np.asarray(hits)

  stacked = tree_map_with_names(first_match, tree)
  return [jax.tree.map(lambda h, i=i: bool(h[i]), stacked)
          for i in range(len(compiled))]


def tree_get(tree, name: str):
  """Fetches a (possibly inner) node by flat name, e.g. "opt/mu/kernel"."""
  flat = dict(_named_leaves(tree, with_inner=True))
  if name not in flat:
    raise KeyError(f"{name!r} not in tree. Available: {sorted(flat)[:50]}")
  return flat[name]


def tree_replace(tree, replacements: dict):
  """Regex rename/remove of flat keys; `None` replacement deletes the key."""
  rules = [(re.compile(k), v) for k, v in replacements.items()]

  def rename(key):
    for pat, repl in rules:
      m = pat.match(key)
      if m and repl is not None:
        key = key[:m.start()] + m.expand(repl) + key[m.end():]
    return key

  def removed(key):
    return any(repl is None and pat.match(key) for pat, repl in rules)

  named, _ = tree_flatten_with_names(tree)
  return tree_unflatten([(rename(k), v) for k, v in named if not removed(k)])


def tree_compare(tree1, tree2):
  """Returns (only-in-1, only-in-2, {key: [(dtype,shape) pair]} mismatches)."""
  t1 = flax.traverse_util.flatten_dict(tree1, sep="/")
  t2 = flax.traverse_util.flatten_dict(tree2, sep="/")
  mismatch = {
      k: [(v.dtype, v.shape), (t2[k].dtype, t2[k].shape)]
      for k, v in t1.items()
      if k in t2 and (v.dtype != t2[k].dtype or v.shape != t2[k].shape)
  }
  return set(t1) - set(t2), set(t2) - set(t1), mismatch


def tree_filter(tree, mask):
  """Keeps only subtrees whose mask is not False (nested dicts only)."""
  if not isinstance(tree, dict):
    assert isinstance(mask, bool), f"Mask leaves must be boolean, got {mask}"
    return tree
  assert sorted(tree) == sorted(mask), f"{tree.keys()} != {mask.keys()}"
  return {k: tree_filter(v, mask[k]) for k, v in tree.items()
          if mask[k] is not False}


def tree_broadcast(prefix, target):
  """Broadcasts a prefix tree onto a full tree (for per-subtree shardings).

  E.g. prefix={"x": s1, "y": s2}, target={"x": {"a": 1, "b": 2}, "y": 3}
  gives {"x": {"a": s1, "b": s1}, "y": s2}.
  """
  def _fill(leaf, subtree):
    return jax.tree.map(lambda _: leaf, subtree)
  return jax.tree.map(_fill, prefix, target)


def recover_dtype(a):
  """np.save writes bfloat16 as void16; reinterpret it back."""
  if hasattr(a, "dtype") and a.dtype.type is np.void:
    assert a.itemsize == 2, f"Unknown void dtype of width {a.itemsize}"
    return a.view(jax.numpy.bfloat16.dtype)
  return a
