"""Optimizer factory: regex-masked schedules, freezing, wd, clipping.

Parity target: reference big_vision/optax.py. The config language:

  config.optax_name = "scale_by_adam" | "big_vision.scale_by_adafactor" | ...
  config.optax      = dict of args for the transform
  config.lr         = base learning rate
  config.schedule   = sched-dict or [(regex, sched-dict-or-None), ...]
                      (None freezes matching params)
  config.lr_mults   = [(regex, mult), ...]
  config.wd         = decoupled weight decay; config.wd_mults masks it
  config.grad_clip_norm (+ grad_clip_per_example)

`make(config, params, sched_kw=...)` returns (optax transform, [sched_fns]).
"""

from __future__ import annotations

import operator

import jax
import jax.numpy as jnp
import optax

import big_vision_tpu.utils as u

__all__ = ["make", "get_count", "replace_frozen", "find_states",
           "scale_by_adafactor", "momentum_hp",
           "clip_by_per_example_global_norm"]


def find_states(opt_state, cls):
  leaves = jax.tree.leaves(
      opt_state, is_leaf=lambda node: isinstance(node, cls))
  return [leaf for leaf in leaves if isinstance(leaf, cls)]


def get_count(opt_state, jittable=False):
  """Extracts the (unique) schedule step count from an optimizer state."""
  counts = [s.count for s in find_states(opt_state, optax.ScaleByScheduleState)]
  if jittable:
    return counts[0]
  ints = {int(c) for c in counts}
  assert len(ints) == 1, f"Expected exactly one ScaleByScheduleState: {ints}"
  return next(iter(ints))


def _make_mask_trees(params, patterns_values):
  patterns, values = zip(*patterns_values)
  return u.make_mask_trees(params, list(patterns)), values


def _split_frozen(masks, scheds):
  """Separates params frozen via schedule=None; asserts full coverage."""
  all_false = jax.tree.map(lambda *bools: not any(bools), *masks)
  not_covered = [k for k, v in u.tree_flatten_with_names(all_false)[0] if v]
  assert not not_covered, (
      f"config.schedule must cover all params (None = frozen): {not_covered}")
  frozen_masks = [m for m, s in zip(masks, scheds) if s is None]
  frozen_mask = jax.tree.map(lambda *bools: any(bools),
                             *frozen_masks, all_false)
  live = [(m, s) for m, s in zip(masks, scheds) if s is not None]
  masks, scheds = zip(*live)
  return frozen_mask, masks, scheds


def replace_frozen(schedule, pytree, replacement, log=None):
  """Replaces leaves of frozen params with `replacement` (e.g. optax.EmptyState
  placeholders that don't waste HBM)."""
  del log
  if not isinstance(schedule, (list, tuple)):
    return pytree
  masks, scheds = _make_mask_trees(pytree, schedule)
  frozen_mask, _, _ = _split_frozen(masks, scheds)
  return jax.tree.map(lambda v, f: replacement if f else v,
                      pytree, frozen_mask)


def clip_by_per_example_global_norm(max_norm):
  """Clips each example's gradient (leading axis) before averaging (DP-SGD
  style); expects per-example grads."""

  def init_fn(params):
    del params
    return optax.EmptyState()

  def update_fn(updates, state, params=None):
    del params
    flat, treedef = jax.tree_util.tree_flatten(updates)
    batch_size = flat[0].shape[0]
    clipped, _ = optax.per_example_global_norm_clip(flat, max_norm)
    summed = jax.tree_util.tree_unflatten(treedef, clipped)
    return jax.tree.map(lambda x: x / batch_size, summed), state

  return optax.GradientTransformation(init_fn, update_fn)


def _resolve_tx(name):
  """Looks up an optax transform by dotted name; 'big_vision.*' → ours."""
  ours = {
      "big_vision.scale_by_adafactor": scale_by_adafactor,
      "big_vision.momentum_hp": momentum_hp,
      "big_vision.sgd": optax.identity,
  }
  if name in ours:
    return ours[name]
  return operator.attrgetter(name)(optax)


def make(config, params, *, sched_kw):
  """Builds the full gradient transform and the list of schedule fns."""
  config = dict(config)

  schedule = config.get("schedule", {})
  if not isinstance(schedule, (tuple, list)):
    schedule = [(".*", schedule)]
  masks, scheds = _make_mask_trees(params, schedule)
  frozen_mask, masks, scheds = _split_frozen(masks, scheds)
  not_frozen_mask = jax.tree.map(operator.not_, frozen_mask)

  def create_schedule(mult=1.0, **kw):
    assert "base" not in kw, kw
    return u.create_learning_rate_schedule(base=mult, **sched_kw, **kw)

  sched_fns = [create_schedule(**dict(s)) for s in scheds]
  schedule_txs = [
      optax.masked(optax.scale_by_schedule(fn), mask)
      for fn, mask in zip(sched_fns, masks)
  ] + [
      # Frozen params: zero their updates (wd has its own mask, so the only
      # way to stop it touching frozen params is zeroing here).
      optax.masked(optax.set_to_zero(), frozen_mask)
  ]

  if clip_norm := config.get("grad_clip_norm"):
    clip_tx = (clip_by_per_example_global_norm(clip_norm)
               if config.get("grad_clip_per_example")
               else optax.clip_by_global_norm(clip_norm))
    grad_clip_tx = optax.masked(clip_tx, not_frozen_mask)
  else:
    grad_clip_tx = optax.identity()

  assert "optim" not in config, "Deprecated; use config.optax."
  tx_func = _resolve_tx(config["optax_name"])
  opt_txs = [optax.masked(tx_func(**config.get("optax", {})),
                          not_frozen_mask)]

  lr_mult_txs = [optax.scale(config["lr"])]
  if config.get("lr_mults"):
    mmasks, mults = _make_mask_trees(params, config["lr_mults"])
    assert all(m > 0 for m in mults), (
        f"Freeze with schedule=None, not lr_mults={mults}")
    lr_mult_txs += [optax.masked(optax.scale(m), mask)
                    for m, mask in zip(mults, mmasks)]

  assert "weight_decay" not in config, "Deprecated; use wd + schedule."
  wd_txs = []
  if config.get("wd"):
    wd_mults = config.get("wd_mults", [(".*/kernel$", 1.0)])
    wmasks, wmults = _make_mask_trees(params, wd_mults)
    wd_txs = [optax.add_decayed_weights(config["wd"] * m, mask)
              for m, mask in zip(wmults, wmasks)]

  tx = optax.chain(
      grad_clip_tx,
      *opt_txs,
      *lr_mult_txs,
      *wd_txs,
      *schedule_txs,
      optax.scale(-1.0),
  )
  return tx, sched_fns


def scale_by_adafactor(min_dim_size_to_factor=32,
                       decay_rate=0.8, decay_offset=0,
                       beta2_cap=0.999,
                       clipping_threshold=None,
                       momentum=0.9, dtype_momentum=jnp.bfloat16,
                       eps=1e-30):
  """big_vision-flavored Adafactor: factored 2nd moment + bf16 momentum.

  Memory: ~1 byte/param extra (bf16 momentum) + O(rows+cols) factored rms,
  vs Adam's 8 bytes/param — the default pretraining optimizer on TPU.
  """
  def _decay_rate_pow(i, exponent):
    t = jnp.array(i, jnp.float32) + 1.0
    return jnp.minimum(beta2_cap, 1.0 - t ** (-exponent))

  scale_by_rms = optax.scale_by_factored_rms(
      factored=True, decay_rate=decay_rate, step_offset=decay_offset,
      min_dim_size_to_factor=min_dim_size_to_factor, epsilon=eps,
      decay_rate_fn=_decay_rate_pow)
  clip = (optax.clip_by_block_rms(clipping_threshold)
          if clipping_threshold else optax.identity())
  mom = (optax.ema(momentum, debias=False, accumulator_dtype=dtype_momentum)
         if momentum else optax.identity())
  return optax.chain(scale_by_rms, clip, mom)


def momentum_hp(momentum=0.9, dtype=jnp.bfloat16, nesterov=False):
  """SGD-momentum with a half-precision accumulator (halves opt state HBM)."""
  return optax.trace(decay=momentum, accumulator_dtype=dtype,
                     nesterov=nesterov)
