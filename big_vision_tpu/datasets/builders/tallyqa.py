"""TallyQA builder (counting VQA; Visual Genome + COCO images).

Raw downloads (reference big_vision/datasets/tallyqa/tallyqa.py:47-50):
  https://github.com/manoja328/TallyQA -> {train,test}.json
  Visual Genome VG_100K{,_2} image dirs, COCO {train,val}2014 image dirs,
arranged as raw_dir/visual_genome/VG_100K*/... and raw_dir/coco/...
"""

from big_vision_tpu.datasets.builders import base


@base.register("tallyqa")
class TallyQa(base.Builder):
  SPLITS = ("train", "test")

  def generate(self, split):
    for v in self.json(f"{split}.json"):
      rel = v["image"]
      if rel.startswith("VG_100K"):
        path = self.path("visual_genome", rel)
      elif rel.startswith(("train2014", "val2014")):
        path = self.path("coco", rel)
      else:
        raise ValueError(f"Unknown image path: {rel}")
      yield {
          "image": base.File(path),
          "image/filename": rel,
          "question_id": v.get("question_id", 0),
          "question": v["question"],
          "answer": int(v["answer"]),
          "issimple": bool(v.get("issimple", False)),
          "data_source": v.get("data_source", ""),
      }
