"""Generic tensor preprocessing ops (device-phase jax where possible).

Parity targets: reference big_vision/pp/ops_general.py (cited per op).
Ops operate on a dict of per-example arrays; device impls are jax functions
traced under vmap, host impls are numpy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from big_vision_tpu.registry import Registry
from big_vision_tpu.pp.utils import InKeyOutKey, PPOp, as_pp_op, maybe_repeat
from big_vision_tpu.utils import trees

def _structural(fn):
  """Pure-python dict manipulation: identical on host and device."""
  return PPOp(fn=fn, host_fn=fn, structural=True)

@Registry.register("preprocess_ops.keep")
def get_keep(*keys):
  """Keeps only the given keys. Ref :143."""
  return _structural(lambda data: {k: v for k, v in data.items() if k in keys})

@Registry.register("preprocess_ops.drop")
def get_drop(*keys):
  """Drops the given keys. Ref :153."""
  return _structural(
      lambda data: {k: v for k, v in data.items() if k not in keys})

@Registry.register("preprocess_ops.copy")
def get_copy(inkey, outkey):
  """Shallow-copies inkey's value to outkey. Ref :163."""
  def _copy(data):
    data = dict(data)
    data[outkey] = jax.tree.map(lambda x: x, data[inkey])
    return data
  return _structural(_copy)

@Registry.register("preprocess_ops.setdefault")
def get_setdefault(key, value):
  """Sets `key` to `value` if missing or empty (host; dynamic). Ref :272."""
  def _setdefault(data):
    data = dict(data)
    x = data.get(key)
    if x is None or np.asarray(x).size == 0:
      proto = np.asarray(x) if x is not None else np.asarray(value)
      v = np.broadcast_to(np.asarray(value, proto.dtype),
                          [s or 1 for s in proto.shape])
      data[key] = v
    return data
  return PPOp(host_fn=_setdefault, phase="host", name="setdefault")

@Registry.register("preprocess_ops.flatten")
def get_flatten(keys=None):
  """Flattens nested sub-dicts into slash-joined keys. Ref :236."""
  def _flatten(data):
    chosen = keys or list(data.keys())
    kept = {k: v for k, v in data.items() if k not in chosen}
    nested = {k: v for k, v in data.items() if k in chosen}
    named, _ = trees.tree_flatten_with_names(nested)
    return {**dict(named), **kept}
  return _structural(_flatten)

@Registry.register("preprocess_ops.rag_tensor")
def get_rag_tensor(*keys):
  """Config-parity no-op: marks keys as ragged (ref :197).

  The reference wraps values in tf.RaggedTensor so tf.data can batch them;
  this pipeline's host phase carries variable-length values natively (as
  lists / object arrays), so nothing needs to happen here.
  """
  del keys
  return _structural(lambda data: data)

@Registry.register("preprocess_ops.reshape")
@as_pp_op()
@InKeyOutKey()
def get_reshape(new_shape):
  """Ref :250."""
  return lambda x: jnp.reshape(jnp.asarray(x), new_shape)

@Registry.register("preprocess_ops.tile")
@as_pp_op()
@InKeyOutKey()
def get_tile(reps):
  """Tiles a tensor by `reps` (ours; no reference counterpart)."""
  return lambda x: jnp.tile(jnp.asarray(x), reps)

@Registry.register("preprocess_ops.squeeze_last_dim")
@as_pp_op()
@InKeyOutKey()
def get_squeeze_last_dim():
  """Ref :178."""
  return lambda x: jnp.squeeze(x, axis=-1)

@Registry.register("preprocess_ops.concat")
def get_concat(inkeys, outkey=None, axis=-1):
  """Concatenates several keys along an axis. Ref :186."""
  @as_pp_op()
  def _factory():
    def _concat(data):
      data = dict(data)
      data[outkey or inkeys[0]] = jnp.concatenate(
          [jnp.asarray(data[k]) for k in inkeys], axis)
      return data
    return _concat
  return _factory()

@Registry.register("preprocess_ops.pad_to_shape")
def get_pad_to_shape(shape, pad_value=0, where="after", key="image",
                     inkey=None, outkey=None):
  """Pads (host phase; variable-in, static-out = staticizer). Ref :209."""
  ik, ok = inkey or key, outkey or key

  def _pads(cur, tgt):
    if tgt is None:
      return (0, 0)
    diff = tgt - cur
    assert diff >= 0, f"pad_to_shape: dim {cur} exceeds target {tgt}"
    return {"before": (diff, 0), "after": (0, diff),
            "both": (diff // 2, diff - diff // 2)}[where]

  def _pad(data):
    x = np.asarray(data[ik])
    assert x.ndim == len(shape), (x.shape, shape)
    paddings = [_pads(x.shape[i], shape[i]) for i in range(len(shape))]
    data = dict(data)
    data[ok] = np.pad(x, paddings,
                      constant_values=np.asarray(pad_value, x.dtype))
    return data

  return PPOp(host_fn=_pad, phase="host", staticizer=True,
              name="pad_to_shape")

@Registry.register("preprocess_ops.onehot")
@as_pp_op()
def get_onehot(depth, key="labels", key_result=None, multi=True, on=1.0,
               off=0.0):
  """One-/multi-hot encodes integer labels. Ref :105."""
  def _onehot(data):
    labels = jnp.asarray(data[key], jnp.int32)
    if labels.ndim > 0 and multi:
      hot = jnp.zeros((depth,), jnp.float32).at[labels].add(1.0)
      x = jnp.clip(hot, 0, 1) * (on - off) + off
    else:
      x = jax.nn.one_hot(labels, depth, dtype=jnp.float32) * (on - off) + off
    data = dict(data)
    data[key_result or key] = x
    return data
  return _onehot

@Registry.register("preprocess_ops.value_range")
@as_pp_op()
@InKeyOutKey()
def get_value_range(vmin=-1, vmax=1, in_min=0, in_max=255.0,
                    clip_values=False):
  """Rescales [in_min, in_max] (per-channel ok) to [vmin, vmax].

  Ref: ops_general.py:32."""
  def _value_range(image):
    in_min_t = jnp.asarray(in_min, jnp.float32)
    in_max_t = jnp.asarray(in_max, jnp.float32)
    image = jnp.asarray(image, jnp.float32)
    image = (image - in_min_t) / (in_max_t - in_min_t)
    image = vmin + image * (vmax - vmin)
    if clip_values:
      image = jnp.clip(image, vmin, vmax)
    return image
  return _value_range

@Registry.register("preprocess_ops.lookup")
def get_lookup(mapping, npzkey="fnames", sep=None, key="image", inkey=None,
               outkey=None):
  """Maps strings to ints via a mapping file (host-only). Ref :67."""
  if mapping.endswith(".npz"):
    with open(mapping, "rb") as f:
      keys = [k.decode() if isinstance(k, bytes) else str(k)
              for k in np.load(f, allow_pickle=False)[npzkey]]
    table = {k: i for i, k in enumerate(keys)}
  else:
    with open(mapping, "r") as f:
      lines = f.read().splitlines()
    if sep is None:
      table = {k: i for i, k in enumerate(lines)}
    else:
      table = {k: int(v) for k, v in (l.split(sep) for l in lines)}

  ik, ok = inkey or key, outkey or key

  def _lookup(data):
    needle = data[ik]
    if isinstance(needle, bytes):
      needle = needle.decode()
    data = dict(data)
    data[ok] = np.int32(table.get(needle, -1))
    return data

  return PPOp(host_fn=_lookup, phase="host", name="lookup")

@Registry.register("preprocess_ops.choice")
def get_choice(n="single", key=None, fewer_ok=False, inkey=None, outkey=None):
  """Samples the same `n` random entries of all keys (host). Ref :284."""
  inkeys = maybe_repeat(inkey or key, 1)
  outkeys = maybe_repeat(outkey or key, 1)
  outkeys = [ok.format(key=ik) for ok, ik in zip(outkeys, inkeys)]
  is_varlen = isinstance(n, (list, tuple))
  min_n = n[0] if is_varlen else 1 if n == "single" else n

  def _choice(data, np_rng):
    data = dict(data)
    nitems = len(data[inkeys[0]])
    for k in inkeys:
      assert len(data[k]) == nitems, f"choice: ragged keys {inkeys}"
    if not fewer_ok:
      assert nitems >= min_n, f"choice: {nitems} < {min_n} items in {inkeys}"
    if n == "single":
      idx = int(np_rng.integers(0, nitems))
      for ik, ok in zip(inkeys, outkeys):
        data[ok] = data[ik][idx]
    else:
      end = int(np_rng.integers(n[0], n[1] + 1)) if is_varlen else n
      perm = np_rng.permutation(nitems)[:end]
      perm.sort()  # keep original order (may be meaningful, e.g. boxes)
      for ik, ok in zip(inkeys, outkeys):
        data[ok] = np.asarray(data[ik])[perm]
    return data

  return PPOp(host_fn=_choice, phase="host", random=True,
              staticizer=not is_varlen and n != "single", name="choice")

@Registry.register("preprocess_ops.choice_no_replacement")
def get_choice_no_replacement(key=None, inkey=None, outkey=None):
  """Picks one entry per key, cycling without replacement per example.

  Like choice(n='single'), but an example (identified by `_id`) seen N
  times cycles through all entries before repeating, with a fresh order
  per cycle (ref :375). Keeps a host-RAM seen-counter; not
  preemption-robust (same caveat as the reference).
  """
  inkeys = maybe_repeat(inkey or key, 1)
  outkeys = maybe_repeat(outkey or key, 1)
  outkeys = [ok.format(key=ik) for ok, ik in zip(outkeys, inkeys)]

  import collections
  counter = collections.defaultdict(lambda: -1)
  instance_seed = np.random.SeedSequence().entropy % (2 ** 31)

  def _choice(data):
    data = dict(data)
    first = np.asarray(data[inkeys[0]])
    assert first.ndim > 0, (
        f"choice_no_replacement on scalar key(s) {inkeys}")
    nitems = len(first)
    for k in inkeys:
      assert len(data[k]) == nitems, f"ragged keys {inkeys}"

    example_id = int(np.asarray(data["_id"]))
    counter[example_id] += 1
    count = counter[example_id]
    shuffle_epoch, shuffle_offset = count // nitems, count % nitems
    rng = np.random.default_rng(
        (instance_seed, example_id, shuffle_epoch))
    index = int(rng.permutation(nitems)[shuffle_offset])
    for ik, ok in zip(inkeys, outkeys):
      data[ok] = np.asarray(data[ik])[index]
    return data

  return PPOp(host_fn=_choice, phase="host", name="choice_no_replacement")
