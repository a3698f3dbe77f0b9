"""VQAv2 builder (coco-2014 images).

Raw downloads (reference big_vision/datasets/vqa/vqa.py:16-24):
  http://images.cocodataset.org/zips/{train2014,val2014,test2015}.zip
  https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/v2_Questions_{Train,Val,Test}_mscoco.zip
  https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/v2_Annotations_{Train,Val}_mscoco.zip
unzipped into one raw_dir.
"""

import os

from big_vision_tpu.datasets.builders import base


@base.register("vqa")
class Vqa(base.Builder):
  SPLITS = ("train", "validation", "test", "test-dev")

  def generate(self, split):
    raw = {"train": "train2014", "validation": "val2014",
           "test": "test2015", "test-dev": "test-dev2015"}[split]
    image_folder = "test2015" if raw == "test-dev2015" else raw
    questions = self.json(
        f"v2_OpenEnded_mscoco_{raw}_questions.json")["questions"]
    annots = {}
    if "test" not in raw:
      annots = {a["question_id"]: a for a in self.json(
          f"v2_mscoco_{raw}_annotations.json")["annotations"]}
    for q in questions:
      qid = q["question_id"]
      fname = f"COCO_{image_folder}_{q['image_id']:012d}.jpg"
      path = self.path(image_folder, fname)
      if "test" in raw and not os.path.isfile(path):
        continue  # a few test images come from the wrong year
      ann = annots.get(qid)
      yield {
          "image/id": q["image_id"],
          "image/filename": fname,
          "image": base.File(path),
          "question_id": qid,
          "question_type": ann["question_type"] if ann else "",
          "question_text": q["question"],
          "answer_type": ann["answer_type"] if ann else "",
          "answers": [a["answer"] for a in ann["answers"]] if ann else [],
          "answer_confidences": ([a["answer_confidence"]
                                  for a in ann["answers"]] if ann else []),
          "top_answer": ann["multiple_choice_answer"] if ann else "",
      }
