"""COCO-35L builder (translated COCO captions; splits train_{lang}/dev_{lang}).

Raw downloads (reference big_vision/datasets/coco35l/coco35l.py:~20-40):
  http://images.cocodataset.org/zips/{train2014,val2014}.zip
  Karpathy dataset_coco.json (id -> filepath mapping)
  https://google.github.io/crossmodal-3600/ -> coco_mt_{train,dev}.jsonl

Each jsonl row has image_id ("<cocoid>_<trg_lang>" style), trg_lang,
caption_tokenized. English examples are reconstructed from the source side
of the de translations (the reference does the same, coco35l.py:138-143).
"""

import collections
import os

from big_vision_tpu.datasets.builders import base

LANGUAGES = (
    "ar", "bn", "cs", "da", "de", "el", "en", "es", "fa", "fi", "fil",
    "fr", "he", "hi", "hr", "hu", "id", "it", "ja", "ko", "mi", "nl",
    "no", "pl", "pt", "quz", "ro", "ru", "sv", "sw", "te", "th", "tr",
    "uk", "vi", "zh")


@base.register("coco35l")
class Coco35L(base.Builder):
  SPLITS = tuple(f"{s}_{l}" for s in ("train", "dev") for l in LANGUAGES)

  def generate(self, split):
    split, language = split.rsplit("_", 1)
    id_to_path = {}
    for d in self.json("dataset_coco.json")["images"]:
      id_to_path[d["cocoid"]] = self.path(d["filepath"], d["filename"])

    grouped = collections.defaultdict(list)
    for j in self.jsonl(f"coco_mt_{split}.jsonl"):
      if language == "en":
        # 35L was built en -> X; recover English from one target's source.
        if j["trg_lang"] == "de":
          grouped[j["image_id"].split("_")[0]].append(
              j.get("src_caption_tokenized", j.get("caption_tokenized")))
      elif j["trg_lang"] == language:
        grouped[j["image_id"].split("_")[0]].append(j["caption_tokenized"])

    for image_id, captions in grouped.items():
      path = id_to_path[int(image_id)]
      if not os.path.isfile(path):
        continue
      yield {
          "image/id": f"{image_id}_{language}",
          "image": base.File(path),
          "captions": captions,
          "language": language,
      }
