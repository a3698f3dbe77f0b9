"""VizWiz-VQA builder.

Raw download (reference big_vision/datasets/vizwizvqa/vizwizvqa.py:60-124):
  https://vizwiz.org/tasks-and-datasets/vqa/ ->
  annotations/{train,val,test}.json + {train,val,test}/<image>.jpg
"""

from big_vision_tpu.datasets.builders import base


@base.register("vizwizvqa")
class VizWizVqa(base.Builder):
  SPLITS = ("train", "val", "test")

  def generate(self, split):
    for v in self.json("annotations", f"{split}.json"):
      image_file = v["image"]
      answers, confidences, answerable = [], [], -1
      if split != "test":
        for a in v["answers"]:
          if not a["answer"]:  # a few train answers are empty strings
            continue
          answers.append(a["answer"])
          confidences.append(a["answer_confidence"])
        answerable = v["answerable"]
      question_id = int(image_file[:-4].split("_")[-1])
      yield {
          "question": v["question"],
          "image/filename": image_file,
          "question_id": question_id,
          "image": base.File(self.path(split, image_file)),
          "answers": answers,
          "answer_confidences": confidences,
          "answerable": answerable,
      }
