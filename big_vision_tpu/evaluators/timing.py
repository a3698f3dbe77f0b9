"""Inference-timing evaluator (no data, no I/O).

Snapshot gap: the reference's configs/proj/flexivit/timing.py configures an
evaluator of ``type='timing'`` (with ``input_shapes`` and a ``pred_kw``
selecting the outputs), but no evaluators/timing.py ships in the public
big_vision snapshot. This implements the obvious contract: feed zero
batches of the configured shapes to the predict_fn and report compile time
and steady-state latency/throughput.

Timing discipline (see docs/perf_notes.md): dispatches are chained and the
clock only stops after a `jax.device_get` of a scalar leaf — on some
platforms `block_until_ready` returns before the transfer is observable.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

API = "jit"


def _sync(out):
  """Device barrier: fetch one scalar derived from every output leaf."""
  leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "dtype")]
  if not leaves:
    return
  jax.device_get(jnp.sum(leaves[-1].ravel()[:1]))


class Evaluator:
  """Times predict_fn on synthetic zero batches.

  Args:
    predict_fn: `(train_state, batch) -> outputs` (pred_kw already bound by
      the evaluator driver, evaluators/common.py:56).
    input_shapes: list of per-example shapes; entry i becomes batch key
      "image" for i == 0 else "input{i}".
    batch_size: examples per timed call.
    timing: master switch (the reference config sets `timing=True`).
    warmup: untimed steady-state calls after compile.
    reps: timed calls; median is reported.
  """

  def __init__(self, predict_fn, input_shapes, batch_size=8, timing=True,
               warmup=2, reps=10, input_keys=None, **kw):
    del kw  # log_steps etc. are consumed by the eval driver.
    self.timing = timing
    self.warmup, self.reps = warmup, reps
    self.batch_size = batch_size
    keys = input_keys or ["image" if i == 0 else f"input{i}"
                          for i in range(len(input_shapes))]
    self.batch = {
        k: np.zeros((batch_size, *shape), np.float32)
        for k, shape in zip(keys, input_shapes)}
    self.predict_fn = jax.jit(predict_fn)

  def run(self, train_state):
    if not self.timing:
      return
    t0 = time.perf_counter()
    _sync(self.predict_fn(train_state, self.batch))
    compile_s = time.perf_counter() - t0

    for _ in range(self.warmup):
      _sync(self.predict_fn(train_state, self.batch))

    times = []
    for _ in range(self.reps):
      t0 = time.perf_counter()
      _sync(self.predict_fn(train_state, self.batch))
      times.append(time.perf_counter() - t0)

    lat = float(np.median(times))
    yield "compile_ms", compile_s * 1e3
    yield "latency_ms", lat * 1e3
    yield "latency_min_ms", float(np.min(times)) * 1e3
    yield "examples_per_sec", self.batch_size / lat
