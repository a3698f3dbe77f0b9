"""Profiler hooks: real jax.profiler traces around training steps.

The reference's `startstop_prof` body is a stub ("TODO: implement using
jax.profiler API", utils.py:1233-1237). This is the real thing: traces are
written to `{workdir}/plugins/profile` (TensorBoard-compatible) for a
window of steps around the first logging step.
"""

from __future__ import annotations

import contextlib

import jax

__all__ = ["startstop_prof", "startstop_prof_at_steps", "profile"]

_ACTIVE = {"dir": None}


def startstop_prof(sess, step=None, first_step=0, log_steps=1, surround=5,
                   **kw):
  """Profiles `surround` steps around the first log step."""
  first_log = first_step + log_steps - (first_step % log_steps)
  start = max(first_log - surround // 2, first_step + 1)
  return startstop_prof_at_steps(sess, step, start, start + surround, **kw)


def startstop_prof_at_steps(sess, step=None, first_step=None,
                            last_step=None, name="steps", logdir=None):
  """Starts/stops a jax.profiler trace when `step` crosses the window."""
  del name
  if jax.process_index() != 0 or logdir is None:
    return sess
  if sess is None and step is not None and step == first_step:
    jax.profiler.start_trace(logdir)
    _ACTIVE["dir"] = logdir
    return "tracing"
  if sess == "tracing" and step is not None and step >= (last_step or 0):
    jax.profiler.stop_trace()
    _ACTIVE["dir"] = None
    return None
  return sess


@contextlib.contextmanager
def profile(name, logdir=None, noop=False):
  """Context manager tracing one block (eval, decode, ...)."""
  if noop or jax.process_index() != 0 or logdir is None:
    yield
    return
  with jax.profiler.trace(logdir):
    with jax.profiler.TraceAnnotation(name):
      yield
