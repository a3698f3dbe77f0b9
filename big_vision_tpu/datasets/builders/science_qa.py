"""ScienceQA builder (image-bearing problems only, like the reference).

Raw download (reference big_vision/datasets/science_qa/science_qa.py:54):
  https://scienceqa.github.io -> problems.json + {train,val,test}/<qid>/<image>
"""

from big_vision_tpu.datasets.builders import base

_ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"


@base.register("science_qa")
class ScienceQa(base.Builder):
  SPLITS = ("train", "val", "test")

  def generate(self, split):
    for qid, v in self.json("problems.json").items():
      if v["split"] != split or not v.get("image"):
        continue  # VQA conversion: drop image-less problems (ref :111-116)
      answer_idx = v["answer"]
      yield {
          "question_id": qid,
          "image": base.File(self.path(split, qid, v["image"])),
          "question": v["question"],
          "choices": v["choices"],
          "answer": _ALPHABET[answer_idx],
          "answer_idx": answer_idx,
          "hint": v.get("hint", ""),
          "lecture": v.get("lecture", ""),
          "solution": v.get("solution", ""),
          "grade": v.get("grade", ""),
          "subject": v.get("subject", ""),
          "topic": v.get("topic", ""),
          "skill": v.get("skill", ""),
      }
