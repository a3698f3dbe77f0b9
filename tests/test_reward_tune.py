"""Detection-reward function (reward_tune config module)."""

import jax.numpy as jnp
import numpy as np
import pytest

from big_vision_tpu.configs.proj.reward_tune import detection_reward as dr


def _encode(boxes01, labels, confs, max_level=999, max_conf=1):
  """Inverse of seq2box for test construction."""
  toks = []
  for b, l, c in zip(boxes01, labels, confs):
    toks += [int(round(x * max_level)) + max_conf + 1 for x in b]
    toks += [l + max_conf + 1 + max_level + 1, c]
  return jnp.asarray(toks)


def test_iou_and_seq_roundtrip():
  assert float(dr.iou_fn(jnp.asarray([0., 0., 1., 1.]),
                         jnp.asarray([0., 0., 1., 1.]))) == pytest.approx(
                             1.0, abs=1e-6)
  assert float(dr.iou_fn(jnp.asarray([0., 0., .5, 1.]),
                         jnp.asarray([.5, 0., 1., 1.]))) == 0.0
  seq = _encode([[0.1, 0.2, 0.5, 0.6]], [3], [1])
  boxes, labels, confs = dr.seq2box(seq, 999, 1, 80)
  np.testing.assert_allclose(np.asarray(boxes)[0], [0.1, 0.2, 0.5, 0.6],
                             atol=1e-3)
  assert int(labels[0]) == 3 and int(confs[0]) == 1


def test_reward_perfect_vs_wrong():
  config = dr.get_config()
  gt = _encode([[0.1, 0.1, 0.6, 0.6], [0.2, 0.7, 0.5, 0.9]], [2, 7],
               [1, 1])
  perfect = gt
  wrong = _encode([[0.1, 0.1, 0.6, 0.6], [0.2, 0.7, 0.5, 0.9]], [5, 9],
                  [1, 1])  # right boxes, wrong classes

  # [batch=1, samples=2, seq]
  seqs = jnp.stack([perfect, wrong])[None]
  rewards, aux = dr.reward_fn(seqs, gt[None], config)
  assert rewards.shape == (1, 2)
  assert float(rewards[0, 0]) > 0.1
  assert float(rewards[0, 1]) == pytest.approx(0.0, abs=1e-6)
  # `correct` marks matched boxes as 2, unmatched real boxes as 1.
  assert np.asarray(aux["correct"])[0, 0].tolist() == [2, 2]
  assert np.asarray(aux["correct"])[0, 1].tolist() == [1, 1]


def test_reward_penalizes_duplicates():
  config = dr.get_config()
  gt = _encode([[0.1, 0.1, 0.6, 0.6]], [2], [1])
  dup = _encode([[0.1, 0.1, 0.6, 0.6], [0.1, 0.1, 0.6, 0.6]], [2, 2],
                [1, 1])
  single = _encode([[0.1, 0.1, 0.6, 0.6]], [2], [1])
  r_single, _ = dr.reward_fn(single[None, None], gt[None], config)
  r_dup, _ = dr.reward_fn(dup[None, None], gt[None], config)
  assert float(r_dup[0, 0]) < float(r_single[0, 0])
