"""NYU-Depth-v2 monocular depth evaluator: RMSE, abs-rel, log10, deltas.

Parity target: reference evaluators/proj/givt/nyu_depth.py. The pp is
expected to apply the standard eval crop and provide `ground_truth`
[H, W, 1]; predictions (`predict_fn` -> {"depth": [h, w]}) are resized to
the GT resolution with nearest neighbour and scored inside the
[min_depth, max_depth] validity mask.
"""

from __future__ import annotations

import jax
import numpy as np

import big_vision_tpu.evaluators.common as c

API = "jit"


class Evaluator:
  """Standard monocular-depth metric suite."""

  def __init__(self, predict_fn, min_depth=1e-3, max_depth=10,
               *, data, devices, **kw):
    self.get_data_iter, self.steps = c.eval_input_pipeline(
        data=data, devices=devices, **kw)
    self.predict_fn = predict_fn
    self.min_depth = min_depth
    self.max_depth = max_depth

  def run(self, train_state):
    metrics = {k: [] for k in ("rmse", "abs_re", "log10", "d1", "d2",
                               "d3")}
    for _, batch in zip(range(self.steps), self.get_data_iter()):
      dev_batch, _ = c.split_batch(batch)
      pred = self.predict_fn(train_state, dev_batch)
      out = jax.device_get({
          "mask": dev_batch["_mask"],
          "gt": np.squeeze(np.asarray(dev_batch["ground_truth"]), -1)
          if hasattr(dev_batch["ground_truth"], "shape") else
          dev_batch["ground_truth"],
          "y": pred["depth"]})
      mask = np.asarray(out["mask"]).astype(bool)

      for gt, y in zip(np.asarray(out["gt"])[mask],
                       np.asarray(out["y"])[mask]):
        y = _resize_nearest(y, gt.shape[:2])
        valid = (gt > self.min_depth) & (gt < self.max_depth)
        g, p = gt[valid], y[valid]
        metrics["rmse"].append(np.sqrt(np.mean((g - p) ** 2)))
        metrics["abs_re"].append(np.mean(np.abs(g - p) / g))
        metrics["log10"].append(np.mean(np.abs(np.log10(g)
                                               - np.log10(p))))
        rel = np.maximum(g / p, p / g)
        for order in (1, 2, 3):
          metrics[f"d{order}"].append(
              np.sum(rel < 1.25 ** order) / rel.size)

    if jax.process_index():
      return
    yield "RMSE", np.mean(metrics["rmse"])
    yield "abs_RE", np.mean(metrics["abs_re"])
    yield "log10", np.mean(metrics["log10"])
    yield "delta1", np.mean(metrics["d1"])
    yield "delta2", np.mean(metrics["d2"])
    yield "delta3", np.mean(metrics["d3"])


def _resize_nearest(img, hw):
  """Host-side nearest-neighbour resize (pure numpy indexing)."""
  h, w = img.shape[:2]
  yy = np.clip((np.arange(hw[0]) * h / hw[0]).astype(int), 0, h - 1)
  xx = np.clip((np.arange(hw[1]) * w / hw[1]).astype(int), 0, w - 1)
  return img[yy][:, xx]
