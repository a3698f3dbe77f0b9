"""Preprocessing-op plumbing: the PPOp contract and the InKeyOutKey helper.

The TPU-native pp design splits every pipeline into two phases:

  * HOST phase — per-example, runs in loader threads, numpy/PIL based.
    Handles bytes -> arrays (JPEG decode) and every variable-shape stage.
  * DEVICE phase — per-example jax functions, vmapped over the batch and
    fused into one jitted XLA program that runs on the accelerator.
    Requires static shapes.

An op declares which phases it supports and whether it is a "staticizer"
(variable-shape in, statically-shaped out — e.g. `resize(224)`). The builder
places the host/device boundary just after the first staticizer (and after
the last host-only op), which is exactly where shapes become static.
"""

from __future__ import annotations

import dataclasses
from collections import abc
from typing import Callable

__all__ = ["maybe_repeat", "PPOp", "as_pp_op", "InKeyOutKey"]


def maybe_repeat(arg, n_reps):
  if not isinstance(arg, abc.Sequence) or isinstance(arg, str):
    arg = (arg,) * n_reps
  return arg


@dataclasses.dataclass
class PPOp:
  """One instantiated preprocessing op.

  Attributes:
    fn: device implementation `(data: dict) -> dict` (jax, per example,
      static shapes) or `(data, rng) -> dict` when `random`.
    host_fn: host implementation (numpy/PIL, per example, any shapes); falls
      back to eager execution of `fn` when absent.
    phase: "host" forces host placement; "auto" lets the builder decide.
    staticizer: output shapes are static given the op's args.
    random: whether the fn consumes an rng argument.
    name: the spec string, for error messages.
  """
  fn: Callable | None = None
  host_fn: Callable | None = None
  phase: str = "auto"
  staticizer: bool = False
  random: bool = False
  structural: bool = False  # pure dict plumbing; can run in either phase
  name: str = ""

  def run_host(self, data, np_rng):
    """Executes on host (loader thread), per example."""
    if self.host_fn is not None:
      return self.host_fn(data, np_rng) if self.random else self.host_fn(data)
    if self.fn is None:
      raise ValueError(f"pp op {self.name!r} has no implementation")
    if self.random:
      import jax
      key = jax.random.PRNGKey(int(np_rng.integers(0, 2**31 - 1)))
      return self.fn(data, key)
    return self.fn(data)

  def run_device(self, data, key):
    if self.fn is None:
      raise ValueError(f"pp op {self.name!r} is host-only")
    return self.fn(data, key) if self.random else self.fn(data)


def as_pp_op(phase="auto", staticizer=False, random=False, host_factory=None):
  """Wraps an op factory so calling it yields a PPOp.

  `host_factory`, if given, is called with the same args to produce the host
  implementation (numpy/PIL) alongside the device one.
  """
  def deco(factory):
    def make(*args, **kw):
      fn = factory(*args, **kw)
      host_fn = host_factory(*args, **kw) if host_factory else None
      return PPOp(fn=fn, host_fn=host_fn, phase=phase,
                  staticizer=staticizer, random=random,
                  name=factory.__name__)
    make.__name__ = factory.__name__
    make.__doc__ = factory.__doc__
    return make
  return deco


class InKeyOutKey:
  """Adds `key`/`inkey`/`outkey` kwargs to single-tensor ops.

  Decorates a factory whose returned fn maps a single value (plus rng if
  `random`) to a new value; lifts it to the dict->dict contract.
  """

  def __init__(self, indefault="image", outdefault="image", with_data=False,
               random=False):
    self.indefault = indefault
    self.outdefault = outdefault
    self.with_data = with_data
    self.random = random

  def __call__(self, factory):
    def make(*args, key=None, inkey=self.indefault, outkey=self.outdefault,
             **kw):
      elem_fn = factory(*args, **kw)
      ik, ok = key or inkey, key or outkey

      if self.random:
        def op(data, rng):
          extra = {"data": data} if self.with_data else {}
          data = dict(data)
          data[ok] = elem_fn(data[ik], rng, **extra)
          return data
      else:
        def op(data):
          extra = {"data": data} if self.with_data else {}
          data = dict(data)
          data[ok] = elem_fn(data[ik], **extra)
          return data
      return op
    make.__name__ = factory.__name__
    make.__doc__ = factory.__doc__
    return make
