import numpy as np
import pytest

import big_vision_tpu.utils as u


def test_steps_direct():
  assert u.steps("total", {"total_steps": 100}) == 100
  assert u.steps("total", {"total_steps": 0}) == 0


def test_steps_examples():
  assert u.steps("total", {"total_examples": 1000}, batch_size=10) == 100
  # Rounds but never below 1 unless exactly 0.
  assert u.steps("total", {"total_examples": 1}, batch_size=256) == 1
  assert u.steps("total", {"total_examples": 0}, batch_size=256) == 0


def test_steps_epochs():
  assert u.steps("total", {"total_epochs": 3},
                 data_size=1000, batch_size=100) == 30


def test_steps_percent():
  assert u.steps("warmup", {"warmup_percent": 0.1}, total_steps=500) == 50


def test_steps_conflicting():
  with pytest.raises(AssertionError):
    u.steps("total", {"total_steps": 1, "total_epochs": 2},
            data_size=10, batch_size=1)


def test_steps_default():
  assert u.steps("warmup", {}, default=0) == 0
  with pytest.raises(ValueError):
    u.steps("warmup", {})


def test_linear_schedule():
  sched = u.create_learning_rate_schedule(
      total_steps=100, base=1.0, decay_type="linear")
  assert float(sched(0)) == pytest.approx(1.0)
  assert float(sched(50)) == pytest.approx(0.5)
  assert float(sched(100)) == pytest.approx(0.0)


def test_cosine_with_warmup():
  sched = u.create_learning_rate_schedule(
      total_steps=100, base=2.0, decay_type="cosine", warmup_steps=10)
  assert float(sched(0)) == pytest.approx(0.0)
  assert float(sched(5)) == pytest.approx(2.0 * 0.5 * (
      1 + np.cos(np.pi * 0.0)) * 0.5)
  # Midpoint of decay: progress = (55-10)/90 = 0.5
  assert float(sched(55)) == pytest.approx(2.0 * 0.5, rel=1e-5)


def test_rsqrt():
  sched = u.create_learning_rate_schedule(
      total_steps=1000, base=1.0, decay_type="rsqrt",
      warmup_steps=100, timescale=100)
  assert float(sched(100)) == pytest.approx(1.0)
  assert float(sched(200)) == pytest.approx(1 / np.sqrt(2), rel=1e-6)


def test_stair():
  sched = u.create_learning_rate_schedule(
      total_steps=100, base=1.0, decay_type="stair",
      steps=[30, 60], mults=[0.1, 0.01])
  assert float(sched(0)) == pytest.approx(1.0)
  assert float(sched(29)) == pytest.approx(1.0)
  assert float(sched(30)) == pytest.approx(0.1)
  assert float(sched(60)) == pytest.approx(0.01)


def test_scale_with_batchsize():
  sched = u.create_learning_rate_schedule(
      total_steps=10, base=1.0, decay_type="linear",
      scale_with_batchsize=True, batch_size=512)
  assert float(sched(0)) == pytest.approx(2.0)
