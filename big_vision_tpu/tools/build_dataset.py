"""CLI: convert raw public downloads into built datasets.

Usage:
  python -m big_vision_tpu.tools.build_dataset \
      --dataset=vqa --raw_dir=/tmp/data [--out_dir=$BV_DATA_DIR] \
      [--splits=train,validation] [--copy]

  python -m big_vision_tpu.tools.build_dataset --list

Parity target: the reference's `tfds build --datasets=<name>` flow over
its custom GeneratorBasedBuilders (reference big_vision/datasets/*/),
re-done TF-free: output is the jsonl+files layout `datasets/built.py`
serves straight into the input pipeline.
"""

import argparse
import sys
import time


def main(argv=None):
  from big_vision_tpu.datasets import builders

  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--dataset", help="builder name (see --list)")
  p.add_argument("--raw_dir", help="directory with the raw downloads")
  p.add_argument("--out_dir", default=None,
                 help="output data dir (default: $BV_DATA_DIR)")
  p.add_argument("--splits", default=None,
                 help="comma-separated subset of splits")
  p.add_argument("--copy", action="store_true",
                 help="copy image files instead of hardlinking")
  p.add_argument("--list", action="store_true", dest="list_builders",
                 help="list registered builders and exit")
  args = p.parse_args(argv)

  if args.list_builders:
    for name in builders.names():
      cls = builders.get(name)
      splits = cls.SPLITS
      if not isinstance(splits, (list, tuple)):  # property on instances
        splits = ()
      print(f"{name}: splits={','.join(splits) or '(dynamic)'}")
    return 0

  if not args.dataset or not args.raw_dir:
    p.error("--dataset and --raw_dir are required (or use --list)")

  t0 = time.time()
  def progress(split, n):
    print(f"  [{time.time() - t0:7.1f}s] {split}: {n} examples...",
          flush=True)

  out = builders.build(
      args.dataset, args.raw_dir, out_dir=args.out_dir,
      splits=args.splits.split(",") if args.splits else None,
      link=not args.copy, progress=progress)
  print(f"Built {args.dataset} -> {out} in {time.time() - t0:.1f}s")
  return 0


if __name__ == "__main__":
  sys.exit(main())
