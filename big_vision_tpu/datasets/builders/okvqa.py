"""OK-VQA builder (coco-2014 images).

Raw downloads (reference big_vision/datasets/okvqa/okvqa.py:101-111):
  https://okvqa.allenai.org/static/data/mscoco_{train,val}2014_annotations.json
  https://okvqa.allenai.org/static/data/OpenEnded_mscoco_{train,val}2014_questions.json
  http://images.cocodataset.org/zips/{train2014,val2014}.zip
"""

from big_vision_tpu.datasets.builders import base


@base.register("okvqa")
class OkVqa(base.Builder):
  SPLITS = ("train", "val")

  def generate(self, split):
    year = f"{split}2014"
    questions = {q["question_id"]: q for q in self.json(
        f"OpenEnded_mscoco_{year}_questions.json")["questions"]}
    annots = self.json(f"mscoco_{year}_annotations.json")["annotations"]
    for ann in annots:
      qid = ann["question_id"]
      image_id = ann["image_id"]
      assert len(ann["answers"]) == 10, (qid, len(ann["answers"]))
      yield {
          "image": base.File(self.path(
              year, f"COCO_{year}_{image_id:012d}.jpg")),
          "image_id": image_id,
          "question_id": qid,
          "question": questions[qid]["question"],
          "answer_type": ann["answer_type"],
          "answers": [a["answer"] for a in ann["answers"]],
          "raw_answers": [a["raw_answer"] for a in ann["answers"]
                          if "raw_answer" in a],
          "top_answer": ann.get("multiple_choice_answer", ""),
      }
