"""POPE builder (object-hallucination probing; coco val2014 images).

Raw layout (reference big_vision/datasets/pope/pope.py:80-145):
  raw_dir/pope/coco_pope_{random,popular,adversarial}.json   (jsonl rows)
  raw_dir/images/val2014/COCO_val2014_*.jpg
Source: github.com/AoiDragon/POPE.
"""

from big_vision_tpu.datasets.builders import base


class _Pope(base.Builder):
  SPLITS = ("test",)
  SOURCE = None

  def generate(self, split):
    del split
    for idx, v in enumerate(self.jsonl("pope", f"coco_{self.SOURCE}.json")):
      question = v["text"]
      thing = (question.replace("Is there an ", "")
               .replace("Is there a ", "").replace(" in the image?", ""))
      yield {
          "question_id": idx,
          "image/filename": v["image"],
          "image": base.File(self.path("images", "val2014", v["image"])),
          "question": question,
          "answer": v["label"],
          "thing": thing,
      }


@base.register("pope/random")
class PopeRandom(_Pope):
  SOURCE = "pope_random"


@base.register("pope/popular")
class PopePopular(_Pope):
  SOURCE = "pope_popular"


@base.register("pope/adversarial")
class PopeAdversarial(_Pope):
  SOURCE = "pope_adversarial"
