"""Download and prepare TFDS datasets for the big_vision_tpu codebase.

Parity target: reference tools/download_tfds_datasets.py. Gated:
tensorflow_datasets is not baked into this image; the script reports how
to proceed instead of crashing on import. Once tfds is installed the
behavior matches the reference (covers cifar10/100, oxford pets/flowers,
imagenet_v2 by default; pass dataset names as argv to override).

For the VQA/captioning transfer datasets, prefer the native TF-free path:
`python -m big_vision_tpu.tools.build_dataset --dataset=<name>
--raw_dir=...` (see datasets/builders/) — no tfds needed.
"""

from __future__ import annotations

import sys

from absl import app

DEFAULT_DATASETS = [
    "cifar10",
    "cifar100",
    "oxford_iiit_pet",
    "oxford_flowers102",
    "imagenet_v2",
]


def main(argv):
  try:
    import tensorflow_datasets as tfds  # pylint: disable=g-import-not-at-top
  except ImportError:
    print(
        "tensorflow_datasets is not installed in this environment.\n"
        "Install it (pip install tensorflow-datasets) or use one of the "
        "native data sources instead: datasets/{arrays,jsonl,imagefolder,"
        "synthetic} need no TFDS.", file=sys.stderr)
    return 1

  if len(argv) > 1 and "download_tfds_datasets.py" in argv[0]:
    datasets = argv[1:]
  else:
    datasets = DEFAULT_DATASETS
  for d in datasets:
    tfds.load(name=d, download=True)
  return 0


if __name__ == "__main__":
  app.run(main)
