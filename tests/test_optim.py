import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import big_vision_tpu.optim as bv_optim
import big_vision_tpu.utils as u


def params_tree():
  return {
      "enc": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)},
      "head": {"kernel": jnp.ones((4, 2)), "bias": jnp.zeros(2)},
  }


def grads_like(params, val=1.0):
  return jax.tree.map(lambda p: jnp.full_like(p, val), params)


def make_tx(config, params, total_steps=100):
  return bv_optim.make(config, params,
                       sched_kw=dict(total_steps=total_steps, batch_size=8,
                                     data_size=800))


def test_sgd_basic_step():
  params = params_tree()
  tx, scheds = make_tx(
      {"optax_name": "big_vision.sgd", "lr": 0.1,
       "schedule": dict(decay_type="linear")}, params)
  assert len(scheds) == 1
  state = tx.init(params)
  upd, state = tx.update(grads_like(params), state, params)
  # step 0: linear schedule=1.0; update = -lr * grad
  np.testing.assert_allclose(upd["enc"]["kernel"], -0.1, rtol=1e-6)
  count = bv_optim.get_count(state)
  assert count == 1


def test_freezing():
  params = params_tree()
  tx, scheds = make_tx(
      {"optax_name": "big_vision.sgd", "lr": 0.1,
       "schedule": [("head/.*", dict(decay_type="linear")), (".*", None)]},
      params)
  assert len(scheds) == 1
  state = tx.init(params)
  upd, _ = tx.update(grads_like(params), state, params)
  np.testing.assert_allclose(upd["enc"]["kernel"], 0.0)
  np.testing.assert_allclose(upd["head"]["kernel"], -0.1, rtol=1e-6)


def test_schedule_must_cover_all():
  with pytest.raises(AssertionError):
    make_tx({"optax_name": "big_vision.sgd", "lr": 0.1,
             "schedule": [("head/.*", dict(decay_type="linear"))]},
            params_tree())


def test_multi_schedule_different_decays():
  params = params_tree()
  tx, scheds = make_tx(
      {"optax_name": "big_vision.sgd", "lr": 1.0,
       "schedule": [("head/.*", dict(decay_type="linear")),
                    (".*", dict(decay_type="stair", steps=[], mults=[]))]},
      params, total_steps=10)
  state = tx.init(params)
  # Advance 5 steps.
  for _ in range(5):
    upd, state = tx.update(grads_like(params), state, params)
  # The 5th update is applied at schedule count 4: linear 1 - 4/10 = 0.6.
  np.testing.assert_allclose(upd["head"]["kernel"], -0.6, rtol=1e-5)
  np.testing.assert_allclose(upd["enc"]["kernel"], -1.0, rtol=1e-6)


def test_lr_mults():
  params = params_tree()
  tx, _ = make_tx(
      {"optax_name": "big_vision.sgd", "lr": 0.1,
       "lr_mults": [("head/.*", 10.0)],
       "schedule": dict(decay_type="stair", steps=[], mults=[])}, params)
  state = tx.init(params)
  upd, _ = tx.update(grads_like(params), state, params)
  np.testing.assert_allclose(upd["enc"]["kernel"], -0.1, rtol=1e-6)
  np.testing.assert_allclose(upd["head"]["kernel"], -1.0, rtol=1e-6)


def test_weight_decay_only_kernels():
  params = params_tree()
  tx, _ = make_tx(
      {"optax_name": "big_vision.sgd", "lr": 1.0, "wd": 0.1,
       "schedule": dict(decay_type="stair", steps=[], mults=[])}, params)
  state = tx.init(params)
  upd, _ = tx.update(grads_like(params, 0.0), state, params)
  # Zero grads: the only update is decoupled wd on kernels (params are 1.0).
  np.testing.assert_allclose(upd["enc"]["kernel"], -0.1, rtol=1e-6)
  np.testing.assert_allclose(upd["enc"]["bias"], 0.0)
  np.testing.assert_allclose(upd["head"]["bias"], 0.0)


def test_grad_clip():
  params = params_tree()
  tx, _ = make_tx(
      {"optax_name": "big_vision.sgd", "lr": 1.0, "grad_clip_norm": 1.0,
       "schedule": dict(decay_type="stair", steps=[], mults=[])}, params)
  state = tx.init(params)
  upd, _ = tx.update(grads_like(params, 100.0), state, params)
  total = optax.global_norm(upd)
  np.testing.assert_allclose(float(total), 1.0, rtol=1e-5)


def test_adafactor_state_memory():
  """bf16 momentum + factored rms: no f32 full-size second moment."""
  params = {"w": jnp.ones((256, 512))}
  tx, _ = make_tx(
      {"optax_name": "big_vision.scale_by_adafactor", "lr": 0.1,
       "schedule": dict(decay_type="rsqrt")}, params)
  state = tx.init(params)
  leaves = jax.tree.leaves(state)
  # Momentum accumulator is bf16 full-size; factored stats are vectors.
  full = [l for l in leaves if getattr(l, "shape", ()) == (256, 512)]
  assert full and all(l.dtype == jnp.bfloat16 for l in full)
  vecs = [l for l in leaves
          if getattr(l, "shape", ()) in [(256,), (512,)]]
  assert vecs, "Expected factored rms row/col stats"


def test_adafactor_descends():
  params = {"w": jnp.ones((64, 64))}
  tx, _ = make_tx(
      {"optax_name": "big_vision.scale_by_adafactor", "lr": 0.01,
       "schedule": dict(decay_type="rsqrt", warmup_steps=1)}, params)
  state = tx.init(params)

  def loss(p):
    return jnp.sum(p["w"] ** 2)

  p = params
  l0 = float(loss(p))
  for _ in range(10):
    g = jax.grad(loss)(p)
    upd, state = tx.update(g, state, p)
    p = optax.apply_updates(p, upd)
  assert float(loss(p)) < l0


def test_momentum_hp_dtype():
  params = params_tree()
  tx, _ = make_tx(
      {"optax_name": "big_vision.momentum_hp", "lr": 0.1,
       "schedule": dict(decay_type="stair", steps=[], mults=[])}, params)
  state = tx.init(params)
  traces = [l for l in jax.tree.leaves(state)
            if getattr(l, "shape", None) == (4, 4)]
  assert traces and traces[0].dtype == jnp.bfloat16


def test_replace_frozen():
  params = params_tree()
  schedule = [("head/.*", dict(decay_type="linear")), (".*", None)]
  out = bv_optim.replace_frozen(schedule, params, None)
  assert out["enc"]["kernel"] is None
  assert out["head"]["kernel"] is not None
