"""nocaps builder (novel object captioning; OpenImages val/test images).

Raw download (reference big_vision/datasets/nocaps/nocaps.py:~20-40):
  https://nocaps.org/ -> nocaps_{val,test}_image_info.json (+ val
  annotations) and the OpenImages images under validation/ and test/.
"""

import collections

from big_vision_tpu.datasets.builders import base

_FILES = {"val": ("nocaps_val_4500_captions.json", "validation"),
          "test": ("nocaps_test_image_info.json", "test")}


@base.register("nocaps")
class NoCaps(base.Builder):
  SPLITS = ("val", "test")

  def generate(self, split):
    fname, image_dir = _FILES[split]
    data = self.json(fname)
    id2caps = collections.defaultdict(list)
    for ann in data.get("annotations", []):
      id2caps[ann["image_id"]].append(ann["caption"])
    for ex in data["images"]:
      yield {
          "image/id": ex["id"],
          "image_filepath": self.path(image_dir, ex["file_name"]),
          "url": ex.get("coco_url", ""),
          "image": base.File(self.path(image_dir, ex["file_name"])),
          "texts": id2caps.get(ex["id"], ["N/A"]),
      }
