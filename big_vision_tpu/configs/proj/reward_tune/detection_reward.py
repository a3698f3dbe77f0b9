"""Object-detection reward for task-reward tuning (arXiv:2302.08242).

Parity target: reference configs/proj/reward_tune/detection_reward.py.
`reward_fn(sample_seqs, labels, config)` scores sampled detection
sequences against GT for REINFORCE-style tuning:

  sample_rewards, aux = reward_fn(sample_seqs, labels, config)
  rewards = sample_rewards[:, 0]
  baselines = (sample_rewards.sum(-1) - rewards) / (num_samples - 1)
  loss = -(rewards - baselines) * logp(sample)  # + confidence supervision

Boxes are encoded as 6-token groups (ymin xmin ymax xmax label conf) over
a quantized coordinate vocabulary. The class-frequency table is the COCO
train-set statistic used by the paper for inverse-frequency weighting.
"""

from __future__ import annotations

import functools

import einops
import jax
import jax.numpy as jnp
import ml_collections as mlc

# COCO detection train-set class frequencies (public dataset statistic).
CLS_COUNTS = [
    262465, 7113, 43867, 8725, 5135, 6069, 4571, 9973, 10759,
    12884, 1865, 1983, 1285, 9838, 10806, 4768, 5508, 6587,
    9509, 8147, 5513, 1294, 5303, 5131, 8720, 11431, 12354,
    6496, 6192, 2682, 6646, 2685, 6347, 9076, 3276, 3747,
    5543, 6126, 4812, 24342, 7913, 20650, 5479, 7770, 6165,
    14358, 9458, 5851, 4373, 6399, 7308, 7852, 2918, 5821,
    7179, 6353, 38491, 5779, 8652, 4192, 15714, 4157, 5805,
    4970, 2262, 5703, 2855, 6434, 1673, 3334, 225, 5610,
    2637, 24715, 6334, 6613, 1481, 4793, 198, 1954,
]


def get_config():
  config = mlc.ConfigDict()
  config.reward_thr = (0.5, 0.55, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85,
                       0.9, 0.95)
  config.correct_thr = 0.5
  config.nms_w = 0.3
  config.max_level = 999
  config.max_conf = 1
  config.num_cls = 80
  config.cls_smooth = 0.1
  config.conf_w = 0.3
  return config


def seq2box(seq, max_level, max_conf, num_cls):
  """Token sequence -> (boxes [N,4] in [0,1], labels [N], confs [N])."""
  dim_per_box = 6
  seq_len = seq.shape[-1]
  seq = seq[..., :(seq_len - seq_len % dim_per_box)]
  seq = einops.rearrange(seq, "... (n d) -> ... n d", d=dim_per_box)

  boxes, labels, confs = seq[..., 0:4], seq[..., 4], seq[..., 5]
  boxes = boxes - max_conf - 1
  labels = labels - max_conf - 1 - max_level - 1
  boxes = jnp.clip(boxes, 0, max_level) / max_level
  labels = jnp.clip(labels, 0, num_cls - 1)
  confs = jnp.clip(confs, 0, max_conf)
  return boxes, labels, confs


def iou_fn(box1, box2):
  ymin1, xmin1, ymax1, xmax1 = box1
  ymin2, xmin2, ymax2, xmax2 = box2
  a1 = jnp.abs((ymax1 - ymin1) * (xmax1 - xmin1))
  a2 = jnp.abs((ymax2 - ymin2) * (xmax2 - xmin2))
  yi = jnp.maximum(0, jnp.minimum(ymax1, ymax2)
                   - jnp.maximum(ymin1, ymin2))
  xi = jnp.maximum(0, jnp.minimum(xmax1, xmax2)
                   - jnp.maximum(xmin1, xmin2))
  inter = xi * yi
  return inter / (a1 + a2 - inter + 1e-9)


iou_fn_batched = jax.vmap(jax.vmap(iou_fn, in_axes=(None, 0)),
                          in_axes=(0, None))


def _reward_fn_thr(seq_pred, seq_gt, thr, nms_w, max_level, max_conf,
                   num_cls, cls_smooth):
  """Reward at one IoU threshold: weighted matches - NMS penalty."""
  cls_counts = jnp.array(CLS_COUNTS)
  weights = 1.0 / (cls_counts + cls_smooth * jnp.sum(cls_counts))
  weights = num_cls * weights / jnp.sum(weights)

  boxes_pred, labels_pred, confs_pred = seq2box(
      seq_pred, max_level, max_conf, num_cls)
  boxes_gt, labels_gt, confs_gt = seq2box(
      seq_gt, max_level, max_conf, num_cls)

  iou = iou_fn_batched(boxes_pred, boxes_gt)
  iou = jnp.where(iou > thr, iou, 0.0)
  # Only real (non-EOS) boxes on both sides, same class.
  iou *= (confs_pred[:, None] > 0) * (confs_gt[None, :] > 0)
  iou *= labels_pred[:, None] == labels_gt[None, :]
  # Each prediction may match one GT box.
  iou *= jax.nn.one_hot(jnp.argmax(iou, axis=1), iou.shape[1])

  correct = jnp.any(iou > 0.0, axis=1).astype("int32") + 1
  correct = jnp.where(confs_pred > 0, correct, 0)

  matches_idx = jnp.argmax(iou, axis=0)
  matches_iou = jnp.take_along_axis(iou, matches_idx[None], axis=0)[0]
  matches_idx = jnp.where(matches_iou > 0.0, matches_idx, -1)
  match_reward = jnp.sum((matches_idx >= 0)
                         * weights[labels_gt][None, :])

  # Duplicate penalty (soft NMS).
  matches_mask = jax.nn.one_hot(matches_idx, iou.shape[0], axis=0)
  nms_penalty = jnp.sum((iou > 0.0) * (1 - matches_mask)
                        * weights[labels_pred][:, None])

  return {
      "reward": match_reward - nms_w * nms_penalty,
      "num_matches": jnp.sum(matches_idx >= 0),
      "nms_penalty": nms_penalty,
      "correct": correct,
      "match_iou": jnp.sum(iou, axis=1),
  }


def reward_fn(seqs_pred, seqs_gt, config):
  """Mean reward over the configured IoU thresholds; returns (r, aux)."""
  result = {}
  correct = match_iou = None
  r_keys = ["reward", "num_matches", "nms_penalty"]
  for thr in config.reward_thr:
    fn = functools.partial(
        _reward_fn_thr, thr=thr, nms_w=config.nms_w,
        max_level=config.max_level, max_conf=config.max_conf,
        num_cls=config.num_cls, cls_smooth=config.cls_smooth)
    rewards = jax.vmap(jax.vmap(fn, in_axes=(0, None)))(seqs_pred,
                                                        seqs_gt)
    result.update({f"{k}-{thr:0.1f}": rewards[k] for k in r_keys})
    if thr == config.correct_thr:
      correct = rewards["correct"]
      match_iou = rewards["match_iou"]

  result.update({
      k: jnp.mean(jnp.array([result[f"{k}-{thr:0.1f}"]
                             for thr in config.reward_thr]), axis=0)
      for k in r_keys})
  return result["reward"], {"result": result, "correct": correct,
                            "match_iou": match_iou}
