"""InfographicVQA builder.

Raw download (reference big_vision/datasets/infovqa/infovqa.py:74-127):
  https://www.docvqa.org/ (InfographicVQA):
  infographicsVQA_{train,val,test}_v1.0[_withQT].json + images/<name>
"""

from big_vision_tpu.datasets.builders import base

_ANNOTATIONS = {
    "train": "infographicsVQA_train_v1.0.json",
    "val": "infographicsVQA_val_v1.0_withQT.json",
    "test": "infographicsVQA_test_v1.0.json",
}


@base.register("infovqa")
class InfoVqa(base.Builder):
  SPLITS = ("train", "val", "test")

  def generate(self, split):
    for x in self.json(_ANNOTATIONS[split])["data"]:
      yield {
          "question_id": x["questionId"],
          "filename": x["image_local_name"],
          "image": base.File(self.path("images", x["image_local_name"])),
          "question": x["question"],
          "answers": x.get("answers", []),
      }
