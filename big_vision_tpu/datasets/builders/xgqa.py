"""xGQA builder (multilingual GQA test sets; GQA images).

Raw layout (reference big_vision/datasets/xgqa/xgqa.py:75-129):
  raw_dir/annotations/zero_shot/testdev_balanced_questions_{lang}.json
  raw_dir/annotations/few_shot/{lang}/{split}.json
  raw_dir/images/<imageId>.jpg     (the GQA images)
Source: github.com/adapter-hub/xGQA.
"""

from big_vision_tpu.datasets.builders import base

LANGUAGES = ("bn", "de", "en", "id", "ko", "pt", "ru", "zh")
_FEWSHOT = {"test_fs": "test", "dev_fs": "dev", "train_fs1": "train_1",
            "train_fs5": "train_5", "train_fs10": "train_10",
            "train_fs20": "train_20", "train_fs25": "train_25",
            "train_fs48": "train_48"}


@base.register("xgqa")
class XGqa(base.Builder):
  SPLITS = tuple(f"test_zs_{l}" for l in LANGUAGES) + tuple(
      f"{k}_{l}" for k in _FEWSHOT for l in LANGUAGES)

  def generate(self, split):
    kind, lang = split.rsplit("_", 1)
    if kind == "test_zs":
      entries = self.json(
          "annotations", "zero_shot",
          f"testdev_balanced_questions_{lang}.json")
    else:
      entries = self.json(
          "annotations", "few_shot", lang, f"{_FEWSHOT[kind]}.json")
    for qid, q in entries.items():
      image_id = q["imageId"]
      yield {
          "example_id": f"{qid}_{lang}",
          "image/id": image_id,
          "image": base.File(self.path("images", f"{image_id}.jpg")),
          "question": q["question"],
          "answer": q.get("answer", ""),
      }
