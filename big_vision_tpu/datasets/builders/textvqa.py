"""TextVQA builder.

Raw downloads (reference big_vision/datasets/textvqa/textvqa.py:~20-40):
  https://dl.fbaipublicfiles.com/textvqa/data/TextVQA_0.5.1_{train,val,test}.json
  https://dl.fbaipublicfiles.com/textvqa/images/train_val_images.zip -> train_images/
  https://dl.fbaipublicfiles.com/textvqa/images/test_images.zip -> test_images/

The reference additionally undoes EXIF rotations recorded in a Rotation.csv
per image dir; images without a csv entry pass through unrotated. We apply
the same correction via PIL when the csv is present.
"""

import csv
import io
import os

from big_vision_tpu.datasets.builders import base

_IMDIR = {"train": "train_images", "val": "train_images",
          "test": "test_images"}


def _rotations(image_dir):
  fname = os.path.join(image_dir, "Rotation.csv")
  if not os.path.isfile(fname):
    return {}
  rot = {}
  with open(fname) as f:
    for row in csv.DictReader(f):
      try:
        rot[row["ImageID"]] = int(float(row["Rotation"] or 0))
      except (KeyError, ValueError):
        continue
  return rot


@base.register("textvqa")
class TextVqa(base.Builder):
  SPLITS = ("train", "val", "test")

  def generate(self, split):
    data = self.json(f"TextVQA_0.5.1_{split}.json")["data"]
    image_dir = self.path(_IMDIR[split])
    rotations = _rotations(image_dir)
    for v in data:
      image_id = str(v["image_id"])
      path = os.path.join(image_dir, image_id + ".jpg")
      rotation = rotations.get(image_id, 0)
      if rotation:
        from PIL import Image
        buf = io.BytesIO()
        Image.open(path).rotate(-rotation, expand=True).save(
            buf, format="JPEG", quality=95)
        image = buf.getvalue()
      else:
        image = base.File(path)
      yield {
          "image/id": v["question_id"],
          "image_filepath": path,
          "image": image,
          "question_id": v["question_id"],
          "question": v["question"],
          "answers": v.get("answers", []),
      }
