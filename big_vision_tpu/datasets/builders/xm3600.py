"""Crossmodal-3600 builder (multilingual image captions; one split/lang).

Raw download (reference big_vision/datasets/xm3600/xm3600.py):
  https://google.github.io/crossmodal-3600/ -> captions.jsonl + images/
"""

from big_vision_tpu.datasets.builders import base

LANGUAGES = (
    "ar", "bn", "cs", "da", "de", "el", "en", "es", "fa", "fi", "fil",
    "fr", "he", "hi", "hr", "hu", "id", "it", "ja", "ko", "mi", "nl",
    "no", "pl", "pt", "quz", "ro", "ru", "sv", "sw", "te", "th", "tr",
    "uk", "vi", "zh")


@base.register("xm3600")
class Xm3600(base.Builder):
  SPLITS = LANGUAGES

  def generate(self, split):
    language = split
    for j in self.jsonl("captions.jsonl"):
      image_key = j["image/key"]
      entry = j[language]
      yield {
          "image/id": f"{image_key}_{language}",
          "image": base.File(self.path("images", f"{image_key}.jpg")),
          "captions": entry["caption"],
          "captions/tokenized": entry.get("caption/tokenized", []),
          "language": language,
      }
