"""Download and prepare TFDS datasets for the big_vision_tpu codebase.

Parity target: reference tools/download_tfds_datasets.py. Gated:
tensorflow_datasets is not baked into this image; the script reports how
to proceed instead of crashing on import. Once tfds is installed the
behavior matches the reference (covers cifar10/100, oxford pets/flowers,
imagenet_v2 by default; pass dataset names on the command line to
override).

For the VQA/captioning transfer datasets, prefer the native TF-free path:
`python -m big_vision_tpu.tools.build_dataset --dataset=<name>
--raw_dir=...` (see datasets/builders/) — no tfds needed.
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_DATASETS = ("cifar10", "cifar100", "oxford_iiit_pet",
                    "oxford_flowers102", "imagenet_v2")

MISSING_TFDS_MSG = """\
tensorflow_datasets is not installed in this environment.
Install it (pip install tensorflow-datasets) or use one of the native data
sources instead: datasets/{arrays,jsonl,imagefolder,synthetic} need no TFDS.
"""


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument("datasets", nargs="*", metavar="DATASET",
                      help=f"TFDS names; default: {', '.join(DEFAULT_DATASETS)}")
  if argv is not None:
    # absl-style argv (matching the reference's app.run(main) convention):
    # argv[0] is the program name, not a dataset.
    argv = argv[1:]
  args = parser.parse_args(argv)

  try:
    import tensorflow_datasets as tfds  # pylint: disable=g-import-not-at-top
  except ImportError:
    print(MISSING_TFDS_MSG, file=sys.stderr)
    return 1

  for name in args.datasets or DEFAULT_DATASETS:
    print(f"Downloading+preparing {name}...")
    tfds.load(name=name, download=True)
  return 0


if __name__ == "__main__":
  sys.exit(main())
