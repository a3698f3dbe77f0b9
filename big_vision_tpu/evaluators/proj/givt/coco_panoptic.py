"""Panoptic segmentation evaluator: native Panoptic Quality (PQ/SQ/RQ).

Parity target: reference evaluators/proj/givt/coco_panoptic.py, which
writes COCO-format pngs and shells out to pycocotools.panopticapi. That
toolchain (and the COCO GT zips) is not in this image, so this evaluator
computes the same metric — Panoptic Quality, Kirillov et al.
(arXiv:1801.00868) — directly in numpy from the 2-channel
(semantics, instances) prediction and a `ground_truth` key of the same
format produced by the pp. Matching follows the official rule: IoU > 0.5
between same-class segments, void (category 0) pixels excluded.

predict_fn -> {"semantics": [B,h,w], "instances": [B,h,w]}.
"""

from __future__ import annotations

import collections

import jax
import numpy as np

import big_vision_tpu.evaluators.common as c

API = "jit"


class Evaluator:
  """PQ / SQ / RQ over 2-channel panoptic maps."""

  def __init__(self, predict_fn, void_label=0, min_fraction=0.0,
               *, data, devices, **kw):
    self.get_data_iter, self.steps = c.eval_input_pipeline(
        data=data, devices=devices, **kw)
    self.predict_fn = predict_fn
    self.void_label = void_label
    self.min_fraction = min_fraction

  def run(self, train_state):
    stats = collections.defaultdict(
        lambda: {"iou": 0.0, "tp": 0, "fp": 0, "fn": 0})

    for _, batch in zip(range(self.steps), self.get_data_iter()):
      dev_batch, _ = c.split_batch(batch)
      y = self.predict_fn(train_state, dev_batch)
      out = jax.device_get({
          "mask": dev_batch["_mask"],
          "gt": dev_batch["ground_truth"],
          "sem": y["semantics"], "inst": y["instances"]})
      mask = np.asarray(out["mask"]).astype(bool)
      for gt, sem, inst in zip(np.asarray(out["gt"])[mask],
                               np.asarray(out["sem"])[mask],
                               np.asarray(out["inst"])[mask]):
        pred = np.stack([sem, _resize_like(inst, sem)], -1) \
            if inst.shape != sem.shape else np.stack([sem, inst], -1)
        gt = np.asarray(gt)
        if gt.shape[:2] != pred.shape[:2]:
          pred = np.stack([_resize_like(pred[..., 0], gt[..., 0]),
                           _resize_like(pred[..., 1], gt[..., 0])], -1)
        accumulate_pq_stats(gt, pred, stats, void=self.void_label)

    # Aggregate across processes: flatten the per-category stats.
    cats = sorted(stats)
    flat = c.process_sum({
        str(k): [stats[k]["iou"], stats[k]["tp"], stats[k]["fp"],
                 stats[k]["fn"]] for k in cats})

    pqs, sqs, rqs = [], [], []
    for k, (iou, tp, fp, fn) in flat.items():
      if tp + fp + fn == 0:
        continue
      sq = iou / tp if tp else 0.0
      rq = tp / (tp + 0.5 * fp + 0.5 * fn)
      pqs.append(sq * rq)
      sqs.append(sq)
      rqs.append(rq)
    if jax.process_index():
      return
    n = max(len(pqs), 1)
    yield "PQ", 100.0 * sum(pqs) / n
    yield "SQ", 100.0 * sum(sqs) / n
    yield "RQ", 100.0 * sum(rqs) / n
    yield "num_categories", len(pqs)


def _segments(panoptic, void):
  """2-channel map -> {(cat, inst_id): bool_mask}, skipping void."""
  seg = {}
  cats = panoptic[..., 0]
  insts = panoptic[..., 1]
  ids = np.stack([cats, insts], -1).reshape(-1, 2)
  for cat, inst in np.unique(ids, axis=0):
    if cat == void:
      continue
    seg[(int(cat), int(inst))] = (cats == cat) & (insts == inst)
  return seg


def accumulate_pq_stats(gt, pred, stats, void=0):
  """Adds one image's TP/FP/FN/IoU contributions to per-category stats."""
  gt_segs = _segments(gt, void)
  pred_segs = _segments(pred, void)
  valid = gt[..., 0] != void  # Void GT pixels are excluded from IoU.

  matched_gt, matched_pred = set(), set()
  for gk, gm in gt_segs.items():
    for pk, pm in pred_segs.items():
      if gk[0] != pk[0] or pk in matched_pred:
        continue
      inter = np.sum(gm & pm & valid)
      union = np.sum((gm | pm) & valid)
      if union and inter / union > 0.5:
        stats[gk[0]]["tp"] += 1
        stats[gk[0]]["iou"] += inter / union
        matched_gt.add(gk)
        matched_pred.add(pk)
        break
  for gk in gt_segs:
    if gk not in matched_gt:
      stats[gk[0]]["fn"] += 1
  for pk, pm in pred_segs.items():
    if pk in matched_pred:
      continue
    # Predictions mostly covering void GT do not count as FPs (official
    # rule: intersection with void > 50% of the segment).
    if np.sum(pm & ~valid) / max(np.sum(pm), 1) > 0.5:
      continue
    stats[pk[0]]["fp"] += 1


def _resize_like(img, ref):
  h, w = ref.shape[:2]
  ih, iw = img.shape[:2]
  yy = np.clip((np.arange(h) * ih / h).astype(int), 0, ih - 1)
  xx = np.clip((np.arange(w) * iw / w).astype(int), 0, iw - 1)
  return img[yy][:, xx]
