"""Raw-data -> built-dataset converters (TF-free TFDS-builder parity).

Each module registers one dataset: a set of splits and a generator that
reads the publicly downloadable raw files and yields example dicts. The
shared `base.build` writes the on-disk layout `datasets/built.py` reads.

Parity target: reference big_vision/datasets/<name>/<name>.py
GeneratorBasedBuilders, minus the tensorflow_datasets toolchain.
"""

from big_vision_tpu.datasets.builders import base

get = base.get
register = base.register
names = base.names
build = base.build


def load_all():
  """Imports every builder module so the registry is fully populated."""
  import importlib
  for mod in ("vqa", "okvqa", "aokvqa", "gqa", "xgqa", "textvqa",
              "chartqa", "coco_captions", "coco35l", "textcaps",
              "science_qa", "tallyqa", "ai2d", "docvqa", "infovqa",
              "stvqa", "vizwizvqa", "pope", "countbenchqa",
              "scicap", "screen2words", "widgetcap", "nocaps",
              "rsvqa", "refcoco", "xm3600"):
    importlib.import_module(f"big_vision_tpu.datasets.builders.{mod}")
