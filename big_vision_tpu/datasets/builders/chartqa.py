"""ChartQA builder ("chartqa/human" and "chartqa/augmented").

Raw download (reference big_vision/datasets/chartqa/chartqa.py:18-22):
  https://huggingface.co/datasets/ahmed-masry/ChartQA/resolve/main/ChartQA%20Dataset.zip
unzipped so raw_dir holds {train,val,test}/{split}_{human,augmented}.json
and {split}/png/<imgname>.
"""

from big_vision_tpu.datasets.builders import base


class _ChartQa(base.Builder):
  SPLITS = ("train", "val", "test")
  SOURCE = None

  def generate(self, split):
    data = self.json(split, f"{split}_{self.SOURCE}.json")
    for idx, v in enumerate(data):
      yield {
          "question_id": idx,
          "image/filename": v["imgname"],
          "image": base.File(self.path(split, "png", v["imgname"])),
          "question": v["query"],
          "answer": v["label"],
      }


@base.register("chartqa/human")
class ChartQaHuman(_ChartQa):
  SOURCE = "human"


@base.register("chartqa/augmented")
class ChartQaAugmented(_ChartQa):
  SOURCE = "augmented"
