"""Durations ("1000 steps" / "3 epochs" / "30%") and LR schedules.

Behavioral parity: reference big_vision/utils.py:1002-1143. Training code only
ever sees integer steps; configs may express any duration as
`{prefix}_{steps,examples,epochs,percent}`.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["steps", "create_learning_rate_schedule", "get_mixup", "mixup"]

_SUFFIXES = ("steps", "examples", "epochs", "percent")


def steps(prefix, config, data_size=None, batch_size=None, total_steps=None,
          default=ValueError):
  """Resolves the duration named `prefix` in `config` to integer steps."""
  config = dict(config)
  found = [s for s in _SUFFIXES
           if (v := config.get(f"{prefix}_{s}")) is not None and v >= 0]
  assert len(found) <= 1, (
      f"Only one of {[f'{prefix}_{s}' for s in found]} may be set.")

  def round_nonzero(x):
    # At least 1 step unless exactly zero was requested.
    return max(1, round(x)) if x else 0

  if "steps" in found:
    return config[f"{prefix}_steps"]
  if "examples" in found and batch_size:
    return round_nonzero(config[f"{prefix}_examples"] / batch_size)
  if "epochs" in found and batch_size and data_size:
    return round_nonzero(config[f"{prefix}_epochs"] * data_size / batch_size)
  if "percent" in found and total_steps:
    pct = config[f"{prefix}_percent"]
    assert 0.0 <= pct <= 1.0, f"{prefix}_percent={pct} not in [0, 1]"
    return round_nonzero(pct * total_steps)

  if default is ValueError:
    raise ValueError(
        f"Cannot resolve duration {prefix!r}: batch_size={batch_size} "
        f"data_size={data_size} total_steps={total_steps}; config keys: "
        f"{sorted(config)}")
  return default


def create_learning_rate_schedule(total_steps, batch_size=None, data_size=None,
                                  base=1.0, decay_type="stair",
                                  scale_with_batchsize=False, **kw):
  """Returns step -> lr. Supports linear/polynomial, cosine, rsqrt, stair,
  all with optional warmup/cooldown multipliers expressed as durations."""

  def to_steps(name, default=0):
    return steps(name, kw, data_size, batch_size, total_steps, default=default)

  warmup = to_steps("warmup")
  cooldown = to_steps("cooldown")
  assert total_steps <= 1 or warmup < total_steps, "warmup >= total_steps"

  def sched(step):
    lr = base
    if scale_with_batchsize:  # Goyal et al. linear scaling rule (ref bs 256).
      lr = lr * batch_size / 256.0

    progress = (step - warmup) / float(max(total_steps - warmup, 1))
    progress = jnp.clip(progress, 0.0, 1.0)
    if decay_type in ("linear", "polynomial"):
      power = kw.get("power", 1)
      end = kw.get("end", kw.get("linear_end", 0))
      lr = end + (lr - end) * (1.0 - progress) ** power
    elif decay_type == "cosine":
      lr = lr * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
    elif decay_type == "rsqrt":
      t = to_steps("timescale", default=kw.get("timescale", 10_000))
      shift = to_steps("shift", default=kw.get("shift", 0))
      lr = jnp.where(
          warmup <= step,
          lr / jnp.sqrt(1 + (step + shift - warmup) / t),
          lr / jnp.sqrt(1 + shift / t))
    elif decay_type == "stair":
      i = jnp.searchsorted(jnp.asarray(kw.get("steps", [])), step + 1)
      lr = lr * jnp.take(jnp.asarray([1.0] + list(kw.get("mults", []))), i)
    else:
      raise ValueError(f"Unknown decay_type {decay_type!r}")

    if warmup:
      lr = lr * jnp.minimum(1.0, step / warmup)
    if cooldown:
      lr = lr * jnp.minimum(1.0, (total_steps - step) / cooldown)
    return jnp.asarray(lr, dtype=jnp.float32)

  return sched


def get_mixup(rng, p):
  """Beta-mixes each batch with itself rolled by one (device-local safe)."""
  import jax  # local import to keep module import light
  rng, rng_mix = jax.random.split(rng)
  a = jax.random.beta(rng_mix, p, p)
  a = jnp.maximum(a, 1.0 - a)

  def _mix(*things, **more):
    mix1 = lambda x: a * x + (1 - a) * jnp.roll(x, shift=1, axis=0)
    return rng, *jax.tree.map(mix1, (things, more))
  return _mix


def mixup(rng, *things, p, **more_things):
  return get_mixup(rng, p)(*things, **more_things)
