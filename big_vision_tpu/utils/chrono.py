"""Chrono: wall-clock accounting for the training loop.

Tracks examples seen, img/sec/core, core-hours by device kind, ETA, and
pause-time (evals/checkpoints) separately from train time, so throughput
numbers are honest. Its state rides in checkpoints so accounting survives
preemption. Parity: reference big_vision/utils.py:411-591.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np

__all__ = ["Chrono", "chrono", "log_memory"]


def log_memory(measure):
  """Logs host + per-device memory stats into the metrics stream."""
  try:
    import psutil
    vmem = psutil.virtual_memory()
    measure("y/hostmem/total", vmem.total)
    measure("y/hostmem/available", vmem.available)
  except ImportError:
    pass
  for i, d in zip([0, 1], jax.local_devices()):
    for k, v in (d.memory_stats() or {}).items():
      if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
        measure(f"y/devmem/dev{i}/{k}", v)


def _hms(s):
  """Seconds -> '1h2m3s' style string."""
  s = int(round(s))
  h, s = divmod(s, 3600)
  m, s = divmod(s, 60)
  parts = ([f"{h}h"] if h else []) + ([f"{m}m"] if (h or m) else []) + [f"{s}s"]
  return "".join(parts)


class Chrono:
  """Measures time taken by the program, training, and pauses."""

  def __init__(self):
    self.program_start_time = time.monotonic()
    self.train_start_time = None
    self.train_start_step = None  # step we started timing at (post-resume)
    self.prev_time = None
    self.prev_step = None
    self.pause_start = None
    self.paused_time = 0.0
    self.total_steps = None
    self.global_bs = None
    self.steps_per_epoch = None
    self.warmup = 2  # First measurements include compile; discard them.
    self.note = "Chrono n/a"
    # Accumulated program time (secs) from previous incarnations (ckpt state).
    self.accum_program_time = 0.0
    self.accum_train_time = 0.0
    self.accum_pause_time = 0.0
    self.accum_examples_seen = 0

  def inform(self, *, first_step=None, total_steps=None, global_bs=None,
             steps_per_epoch=None, measure=None, write_note=None):
    """Provide run metadata; may be called multiple times with partial info."""
    self.prev_step = first_step if first_step is not None else self.prev_step
    self.total_steps = total_steps if total_steps is not None else self.total_steps
    self.global_bs = global_bs if global_bs is not None else self.global_bs
    self.steps_per_epoch = (
        steps_per_epoch if steps_per_epoch is not None else self.steps_per_epoch)
    if self.total_steps and self.prev_step is not None:
      self.note = (f"Steps:{self.prev_step}/{self.total_steps} "
                   f"[{self.prev_step / self.total_steps:.1%}]")
    self._measure = measure or getattr(self, "_measure", None)
    self._write_note = write_note or getattr(self, "_write_note", None)

  def tick(self, step, measure=None, write_note=None):
    """Call once per (logged) step to emit timing metrics."""
    measure = measure or self._measure
    write_note = write_note or self._write_note
    now = time.monotonic()
    measure("uptime", now - self.program_start_time)

    if self.warmup > 1:
      self.warmup -= 1
      write_note(self.note)
      return
    if self.warmup == 1:  # Steady state begins: set the t=0 reference.
      self.train_start_time = self.prev_time = now
      self.train_start_step = self.prev_step
      self.warmup = 0
      write_note(self.note)
      return

    examples = step * self.global_bs
    self.accum_examples_seen = examples
    measure("examples_seen", examples)
    if self.steps_per_epoch:
      measure("epoch", step / self.steps_per_epoch)

    dstep = step - self.prev_step
    dtime = now - self.prev_time
    if dstep:
      measure("img/sec/core",
              self.global_bs * dstep / dtime / jax.device_count())
      steps_timed = step - self.train_start_step
      core_hours = (now - self.train_start_time) * jax.device_count() / 3600
      devtype = jax.devices()[0].device_kind.replace(" ", "_")
      measure(f"core_hours_{devtype}", core_hours)
      measure("core_hours", core_hours)
      eta = (self.total_steps - step) * (now - self.train_start_time) / steps_timed
      self.note = (
          f"Steps:{step}/{self.total_steps} [{step / self.total_steps:.1%}] "
          f"ETA:{_hms(eta)}")
    self.prev_time = now
    self.prev_step = step
    write_note(self.note)

  def pause(self, wait_for=()):
    """Stop the train-time clock (evals, ckpts); blocks on `wait_for`."""
    assert self.pause_start is None, "Chrono already paused"
    jax.block_until_ready(wait_for)
    self.pause_start = time.monotonic()

  def resume(self):
    assert self.pause_start is not None, "Chrono not paused"
    pause = time.monotonic() - self.pause_start
    self.paused_time += pause
    self.accum_pause_time += pause
    self.pause_start = None
    # Shift the timing reference so the pause doesn't count as train time.
    if self.train_start_time is not None:
      self.train_start_time += pause
    if self.prev_time is not None:
      self.prev_time += pause

  @contextlib.contextmanager
  def log_timing(self, name, *, noop=False):
    """Measures wall-time of a block into the metrics stream."""
    t0 = time.monotonic()
    yield
    if not noop and getattr(self, "_measure", None):
      self._measure(name, time.monotonic() - t0)

  def save(self):
    """Checkpointable state (plain floats so it broadcasts trivially)."""
    now = time.monotonic()
    return np.asarray([
        self.accum_program_time + now - self.program_start_time,
        self.accum_train_time + (
            (now - self.train_start_time) if self.train_start_time else 0.0),
        self.accum_pause_time,
        float(self.accum_examples_seen),
    ], np.float64)

  def load(self, state):
    state = np.asarray(state, np.float64)
    self.accum_program_time = float(state[0])
    self.accum_train_time = float(state[1])
    self.accum_pause_time = float(state[2])
    self.accum_examples_seen = int(state[3])


# Process-wide singleton, same pattern as the reference's `u.chrono`.
chrono = Chrono()
