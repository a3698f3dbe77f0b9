#!/usr/bin/env python
"""Trained-to-quality run: train configs/quality_digits.py to its pinned bar.

Materializes a deterministic stratified train/test split of sklearn's
bundled load_digits (1,797 REAL handwritten digit scans — the only real
image data baked into this environment), trains the full big_vision_tpu
stack on it, and records the achieved test metric next to the in-config
expectation (mirroring ref configs/vit_s16_i1k.py:18-19's pinned-results
convention) in QUALITY_r05.json.

Usage:
    python tools/run_quality.py [--workdir /tmp/bvt_quality] [--runlocal]
"""
import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_split(npz_dir, test_per_class=36, seed=0):
  """Deterministic stratified split: 1437 train / 360 test (36 per class)."""
  from sklearn.datasets import load_digits
  d = load_digits()
  # 8x8 float64 in [0,16] -> uint8 [0,255] HWC3 so the standard image pp
  # chain (resize/value_range) applies unchanged.
  imgs = np.round(d.images * (255.0 / 16.0)).astype(np.uint8)
  imgs = np.repeat(imgs[..., None], 3, axis=-1)
  labels = d.target.astype(np.int64)
  rng = np.random.default_rng(seed)
  test_idx = []
  for c in range(10):
    idx_c = np.flatnonzero(labels == c)
    test_idx.append(rng.permutation(idx_c)[:test_per_class])
  test_idx = np.sort(np.concatenate(test_idx))
  train_mask = np.ones(len(labels), bool)
  train_mask[test_idx] = False
  os.makedirs(npz_dir, exist_ok=True)
  np.savez(os.path.join(npz_dir, "digits_train.npz"),
           image=imgs[train_mask], label=labels[train_mask])
  np.savez(os.path.join(npz_dir, "digits_test.npz"),
           image=imgs[test_idx], label=labels[test_idx])
  return int(train_mask.sum()), len(test_idx)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--workdir", default="/tmp/bvt_quality")
  ap.add_argument("--npz_dir", default="/tmp/bvt_digits")
  ap.add_argument("--runlocal", action="store_true",
                  help="40-step smoke variant (no quality assertion)")
  ap.add_argument("--steps", type=int, default=None,
                  help="override total_steps (shortened CI re-train)")
  ap.add_argument("--bar", type=float, default=None,
                  help="override the val/prec@1 bar (use with --steps)")
  ap.add_argument("--out", default=os.path.join(REPO, "QUALITY_r05.json"))
  args = ap.parse_args()

  n_train, n_test = make_split(args.npz_dir)
  print(f"digits split: {n_train} train / {n_test} test -> {args.npz_dir}")

  from big_vision_tpu.configs import quality_digits
  arg = f"npz_dir={args.npz_dir}" + (",runlocal=True" if args.runlocal else "")
  if args.steps:
    arg += f",total_steps={args.steps}"
  config = quality_digits.get_config(arg)
  expected = dict(quality_digits.EXPECTED)
  if args.bar is not None:
    expected["val/prec@1"] = args.bar
    config.expected = dict(expected)

  from big_vision_tpu import train
  train.main(config=config, workdir=args.workdir)

  # Final val metrics = last row of the trainer's JSONL that carries them.
  achieved = {}
  with open(os.path.join(args.workdir, "big_vision_metrics.txt")) as f:
    for line in f:
      row = json.loads(line)
      for k in expected:
        if k in row:
          achieved[k] = row[k]
          achieved["step"] = row["step"]

  result = {
      "config": "big_vision_tpu/configs/quality_digits.py",
      "data": ("sklearn load_digits: 1797 real NIST handwritten digit "
               f"scans, {n_train} train / {n_test} test stratified split"),
      "steps": int(config.total_steps),
      "model": dict(config.model),
      "expected": expected,
      "achieved": achieved,
      "runlocal": bool(args.runlocal),
      "ok": all(achieved.get(k, 0.0) >= v
                for k, v in expected.items()),
  }
  with open(args.out, "w") as f:
    json.dump(result, f, indent=1)
  print(json.dumps(result, indent=1))
  if not args.runlocal and not result["ok"]:
    sys.exit(1)


if __name__ == "__main__":
  main()
