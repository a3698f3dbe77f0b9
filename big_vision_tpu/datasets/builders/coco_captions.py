"""COCO captions builder (Karpathy splits: train/restval/val/test).

Replaces tfds's public `coco_captions` dataset, which the cococap/coco35l
transfer configs consume (reference
configs/proj/paligemma/transfers/cococap.py uses splits train/restval/val).

Raw downloads:
  http://images.cocodataset.org/zips/{train2014,val2014}.zip
  https://cs.stanford.edu/people/karpathy/deepimagesent/caption_datasets.zip
    -> dataset_coco.json   (Karpathy split assignments + captions)

Rows carry nested {"captions": {"id": [...], "text": [...]}} matching
tfds's structure so the configs' `flatten|copy('captions/text', ...)`
pp chains work unchanged.
"""

from big_vision_tpu.datasets.builders import base

_SPLIT = {"train": "train", "restval": "restval", "val": "val",
          "test": "test"}


@base.register("coco_captions")
class CocoCaptions(base.Builder):
  SPLITS = ("train", "restval", "val", "test")

  def generate(self, split):
    data = self.json("dataset_coco.json")["images"]
    for img in data:
      if img["split"] != _SPLIT[split]:
        continue
      sents = img["sentences"]
      yield {
          "image/id": img["cocoid"],
          "image/filename": img["filename"],
          "image": base.File(self.path(img["filepath"], img["filename"])),
          "captions": {
              "id": [s["sentid"] for s in sents],
              "text": [s["raw"] for s in sents],
          },
      }
