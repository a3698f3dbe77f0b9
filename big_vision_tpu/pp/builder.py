"""Preprocessing pipeline builder.

Turns a pp string ``"decode_jpeg_and_inception_crop(224)|flip_lr|value_range(-1,1)"``
into a two-phase `PreprocessFn` (see pp/utils.py for the phase model):

  pfn = get_preprocess_fn(spec)
  example = pfn.host(raw_example, np_rng)     # loader threads, per example
  batch   = pfn.device(batch, jax_key)        # one jitted program, on device

The string mini-language matches the reference (`big_vision/pp/builder.py:22`)
so reference configs work unchanged; the execution model is new.
"""

from __future__ import annotations

import jax

from big_vision_tpu import registry as bvt_registry
from big_vision_tpu.pp.utils import PPOp

__all__ = ["get_preprocess_fn", "PreprocessFn"]


class PreprocessFn:
  """A parsed pipeline with a host prefix and a device suffix."""

  def __init__(self, ops: list[PPOp], specs: list[str]):
    self.ops = ops
    self.specs = specs
    # The device phase starts after (a) the last host-only op and (b) the
    # first staticizer — the earliest point where shapes are known static.
    last_host = max(
        (i for i, op in enumerate(ops) if op.phase == "host" or op.fn is None),
        default=-1)
    first_static = next(
        (i for i, op in enumerate(ops) if op.staticizer), -1)
    self.host_end = max(last_host, first_static)
    # Structural ops (keep/drop/flatten/...) directly after the host phase
    # stay on the host: they may resolve nested dicts or variable shapes
    # that cannot cross the batch-collation boundary.
    while (self.host_end + 1 < len(ops) and self.host_end >= 0
           and ops[self.host_end + 1].structural):
      self.host_end += 1

  @property
  def host_ops(self):
    return self.ops[:self.host_end + 1]

  @property
  def device_ops(self):
    return self.ops[self.host_end + 1:]

  def host(self, data, np_rng):
    """Runs the host phase on one example (dict of numpy/bytes)."""
    for op in self.host_ops:
      data = op.run_host(data, np_rng)
    return data

  def _device_one(self, data, key):
    keys = jax.random.split(key, max(len(self.device_ops), 1))
    for op, k in zip(self.device_ops, keys):
      data = op.run_device(data, k)
    return data

  def device(self, batch, key):
    """Runs the device phase on a batch: vmapped per-example, jit by caller."""
    if not self.device_ops:
      return batch
    leading = jax.tree.leaves(batch)[0].shape[0]
    keys = jax.random.split(key, leading)
    return jax.vmap(self._device_one)(batch, keys)

  def __call__(self, data, np_rng=None):
    """Full per-example host execution (tests, host-only fallback)."""
    import numpy as np
    np_rng = np_rng or np.random.default_rng(0)
    for op in self.ops:
      key = jax.random.PRNGKey(int(np_rng.integers(0, 2**31 - 1)))
      if op.fn is None or op.phase == "host":
        data = op.run_host(data, np_rng)
      else:
        data = op.run_device(data, key)
    # Map over leaves: op outputs may be nested (patchify's dict,
    # tuplify's tuple) and must not be collapsed by np.asarray.
    return jax.tree.map(
        lambda v: v if isinstance(v, (bytes, str)) else np.asarray(v), data)


def get_preprocess_fn(pp_pipeline, log_data=False, log_steps=False):
  """Parses a pp string into a PreprocessFn. Empty/None -> identity."""
  del log_data, log_steps  # Logging handled by the input pipeline.
  ops, specs = [], []
  for op_spec in (pp_pipeline or "").split("|"):
    op_spec = op_spec.strip()
    if not op_spec:
      continue
    op = bvt_registry.Registry.lookup(f"preprocess_ops.{op_spec}")()
    assert isinstance(op, PPOp), (
        f"Factory for {op_spec!r} must return a PPOp, got {type(op)}")
    op.name = op_spec
    ops.append(op)
    specs.append(op_spec)
  return PreprocessFn(ops, specs)
