"""Recompile guards: steady-state training must not retrace.

Mirrors the reference's chex.assert_max_traces pattern (utils_test.py:61):
if the input pipeline yields dtype/shape-unstable batches, the jitted step
silently recompiles every step and throughput collapses — this guards it.
"""

import chex
import jax
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.input_pipeline as ip
import big_vision_tpu.pp.ops_general  # noqa: F401
import big_vision_tpu.pp.ops_image  # noqa: F401


def test_training_batches_do_not_retrace():
  train_iter, _ = ip.training(dict(
      data=dict(name="synthetic", n=64, num_classes=8, h=24, w=24),
      batch_size=16, shuffle_buffer_size=32, num_threads=2, prefetch=1,
      pp=("decode|resize(16)|value_range(-1, 1)"
          "|onehot(8, key='label', key_result='labels')"
          "|keep('image', 'labels')"),
  ), seed=0)

  @jax.jit
  @chex.assert_max_traces(n=1)
  def step(batch):
    return jnp.mean(batch["image"]) + jnp.sum(batch["labels"])

  for _ in range(4):
    batch = next(train_iter)
    batch = {k: v for k, v in batch.items() if isinstance(v, jax.Array)}
    out = step(batch)
  assert np.isfinite(jax.device_get(out))
  chex.clear_trace_counter()


def test_inference_batches_do_not_retrace():
  make_iter, steps = ip.make_for_inference(
      dict(name="synthetic", n=20, num_classes=8, h=24, w=24),
      pp=("decode|resize(16)|value_range(-1, 1)|keep('image')"),
      batch_size=8, devices=jax.devices())

  @jax.jit
  @chex.assert_max_traces(n=1)
  def fwd(batch):
    return jnp.mean(batch["image"], axis=(1, 2, 3))

  n = 0
  for _, batch in zip(range(steps), make_iter()):
    out = fwd({"image": batch["image"]})
    n += int(np.sum(np.asarray(jax.device_get(batch["_mask"])) != 0))
  # Padding contract: all 20 real examples seen, batches shape-stable.
  assert n == 20
  assert out.shape == (8,)
  chex.clear_trace_counter()
