"""Metric writer: one JSON object per step, appended to a JSONL file.

Host-0 only; writes happen on a single background thread so the train loop
never blocks on filesystem latency. Parity: reference utils.py:1242-1299.
"""

from __future__ import annotations

import concurrent.futures
import json
import os
import sys

import jax
import numpy as np

__all__ = ["MetricWriter", "write_note"]


def write_note(note: str):
  if jax.process_index() == 0:
    print(f"\x1b[33mNOTE\x1b[0m: {note}", flush=True, file=sys.stderr)


class MetricWriter:
  """Collects measure() calls per step and flushes them as one JSONL row."""

  def __init__(self, workdir=None, *, echo=True):
    self.step_start(0)
    self.echo = echo
    self.fname = None
    if jax.process_index() == 0 and workdir:
      os.makedirs(workdir, exist_ok=True)
      self.fname = os.path.join(workdir, "big_vision_metrics.txt")
    self.pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)

  def step_start(self, step):
    self.step = step
    self.step_metrics = {}

  def measure(self, name, value):
    """Records one metric; returns the concrete value for convenience."""
    if jax.process_index() != 0:
      return value
    # Any jax array funnelled here forces a device->host sync; callers are
    # expected to throttle via log_steps.
    value = np.asarray(jax.device_get(value))
    assert value.size == 1, f"Measurement {name} must be scalar, got {value.shape}"
    value = float(value.flatten()[0])
    self.step_metrics[name] = value
    if self.echo:
      print(f"{self.step}] {name} = {value:.6g}", flush=True)
    return value

  def step_end(self):
    """Flushes the current step's metrics asynchronously."""
    if not self.step_metrics or self.fname is None:
      self.step_metrics = {}
      return
    row = json.dumps({"step": self.step, **self.step_metrics})
    self.step_metrics = {}
    def append(fname=self.fname, row=row):
      with open(fname, "a") as f:
        f.write(row + "\n")
    self.pool.submit(append)

  def close(self):
    self.step_end()
    self.pool.shutdown(wait=True)
