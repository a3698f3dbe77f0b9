"""TextCaps builder (captions grouped per image).

Raw downloads (reference big_vision/datasets/textcaps/textcaps.py:~20-40):
  https://dl.fbaipublicfiles.com/textvqa/data/textcaps/TextCaps_0.1_{train,val,test}.json
  https://dl.fbaipublicfiles.com/textvqa/images/train_val_images.zip -> train_images/
  https://dl.fbaipublicfiles.com/textvqa/images/test_images.zip -> test_images/
"""

import collections

from big_vision_tpu.datasets.builders import base

_IMDIR = {"train": "train_images", "val": "train_images",
          "test": "test_images"}


@base.register("textcaps")
class TextCaps(base.Builder):
  SPLITS = ("train", "val", "test")

  def generate(self, split):
    data = self.json(f"TextCaps_0.1_{split}.json")["data"]
    grouped = collections.defaultdict(list)
    names = {}
    for ex in data:
      names[ex["image_id"]] = ex["image_name"]
      if ex.get("caption_str"):
        grouped[ex["image_id"]].append(ex["caption_str"])
      else:
        grouped.setdefault(ex["image_id"], [])
    for image_id, texts in grouped.items():
      path = self.path(_IMDIR[split], f"{names[image_id]}.jpg")
      yield {
          "image/id": image_id,
          "image_filepath": path,
          "image": base.File(path),
          "texts": texts,
      }
