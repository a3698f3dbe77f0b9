"""GQA builder.

Raw downloads (reference big_vision/datasets/gqa/gqa.py:~20-40):
  https://downloads.cs.stanford.edu/nlp/data/gqa/questions1.2.zip
  https://downloads.cs.stanford.edu/nlp/data/gqa/images.zip
unzipped so raw_dir holds {split}_questions.json (and
train_all_questions/*.json) plus images/<imageId>.jpg.
"""

import glob
import os

from big_vision_tpu.datasets.builders import base


@base.register("gqa")
class Gqa(base.Builder):
  SPLITS = ("train_balanced", "val_balanced", "testdev_balanced",
            "train_all", "val_all", "testdev_all", "challenge_all",
            "challenge_balanced")

  def generate(self, split):
    if split == "train_all":
      files = sorted(glob.glob(
          self.path("train_all_questions", "*.json")))
    else:
      files = [self.path(f"{split}_questions.json")]
    for fname in files:
      with open(fname) as f:
        import json
        annotations = json.load(f)
      for qid, q in annotations.items():
        image_id = q["imageId"]
        yield {
            "example_id": qid,
            "image/id": image_id,
            "image": base.File(self.path("images", f"{image_id}.jpg")),
            "question": q["question"],
            "answer": q.get("answer", ""),
            "full_answer": q.get("fullAnswer", ""),
            "is_balanced": bool(q.get("isBalanced", True)),
        }
