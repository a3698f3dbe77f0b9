"""DocVQA builder.

Raw download (reference big_vision/datasets/docvqa/docvqa.py:66-107):
  https://www.docvqa.org/ (Task 1 - Single Page Document VQA):
  {train,val,test}_v1.0[_withQT].json + {split}/documents/<image>.png
"""

from big_vision_tpu.datasets.builders import base


@base.register("docvqa")
class DocVqa(base.Builder):
  SPLITS = ("train", "val", "test")

  def generate(self, split):
    suffix = "" if split == "test" else "_withQT"
    data = self.json(f"{split}_v1.0{suffix}.json")["data"]
    for v in data:
      yield {
          "question_id": v["questionId"],
          "image/filename": v["image"],
          "image": base.File(self.path(split, v["image"])),
          "question": v["question"],
          "answers": v.get("answers", []),
      }
