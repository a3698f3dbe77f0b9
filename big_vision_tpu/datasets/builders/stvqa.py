"""ST-VQA builder (scene-text VQA, task 3).

Raw download (reference big_vision/datasets/stvqa/stvqa.py:16-30):
  https://rrc.cvc.uab.es/?ch=11 -> {train,test}_task_3.json +
  train_images/ + test_task3_images/ (+ coco train2014/ for the
  coco-text subset).

The public data has no val split; the reference carves a pseudo-val out
of train via a frozen image-path list (stvqa/val_ids.py). We mirror that
with an optional val_ids.json file in raw_dir (list of file_path strings);
without it, train keeps everything and val is empty.
"""

import os

from big_vision_tpu.datasets.builders import base


@base.register("stvqa")
class StVqa(base.Builder):
  SPLITS = ("train", "val", "test")

  def _val_ids(self):
    p = self.path("val_ids.json")
    if os.path.isfile(p):
      return set(self.json("val_ids.json"))
    return set()

  def generate(self, split):
    src = "test" if split == "test" else "train"
    images_dir = f"{src}{'_task3' if src == 'test' else ''}_images"
    val_ids = self._val_ids()
    for x in self.json(f"{src}_task_3.json")["data"]:
      if split == "val" and x["file_path"] not in val_ids:
        continue
      if split == "train" and x["file_path"] in val_ids:
        continue
      path = self.path(images_dir, x["file_path"])
      if x["file_path"].startswith("coco-text"):
        # Use the high-res coco originals for the coco-text subset.
        path = self.path("train2014", os.path.basename(x["file_path"]))
      yield {
          "question_id": x["question_id"],
          "filename": x["file_path"],
          "image": base.File(path),
          "question": x["question"],
          "answers": x.get("answers", []),
      }
