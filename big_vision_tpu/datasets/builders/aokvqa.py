"""A-OKVQA builder (coco-2017 images).

Raw downloads (reference big_vision/datasets/aokvqa/aokvqa.py:82-90):
  https://prior-datasets.s3.us-east-2.amazonaws.com/aokvqa/aokvqa_v1p0.tar.gz
    -> aokvqa_v1p0_{train,val,test}.json
  http://images.cocodataset.org/zips/{train2017,val2017,test2017}.zip
"""

from big_vision_tpu.datasets.builders import base

_IMDIR = {"train": "train2017", "val": "val2017", "test": "test2017"}


@base.register("aokvqa")
class AOkVqa(base.Builder):
  SPLITS = ("train", "val", "test")

  def generate(self, split):
    for v in self.json(f"aokvqa_v1p0_{split}.json"):
      image_id = v["image_id"]
      test = split == "test"
      yield {
          "image": base.File(self.path(
              _IMDIR[split], f"{image_id:012d}.jpg")),
          "image_id": image_id,
          "question_id": v["question_id"],
          "question": v["question"],
          "multiple_choice_possible_answers": v["choices"],
          "multiple_choice_correct_idx":
              -1 if test else v["correct_choice_idx"],
          "direct_answers": [] if test else v.get("direct_answers", []),
          "answer_rationales": [] if test else v.get("rationales", []),
          "difficult_direct_answer": v.get("difficult_direct_answer", False),
      }
