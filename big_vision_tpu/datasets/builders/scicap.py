"""SciCap builder (scientific figure captioning).

Raw download (reference big_vision/datasets/scicap/scicap.py):
  https://github.com/tingyaohsu/SciCap -> scicap_data.zip unzipped:
  SciCap-Caption-All/{split}/<id>.json, SciCap-{Yes,No}-Subfig-Img/{split}/,
  List-of-Files-for-Each-Experiments/<config>/{split}/file_idx.json

Registered per config like the reference's BUILDER_CONFIGS; the transfer
config uses scicap/first_sentence_subfig_no. Rows carry the caption
variants flat ("caption/..." keys) plus a convenience "caption" string
(the lowercase+token+no-figure-index one the reference transfer trains
on, reference configs/proj/paligemma/transfers/scicap.py:23).
"""

from big_vision_tpu.datasets.builders import base

_CONFIG_TO_IDS_PATH = {
    ("single_sentence", True): "Single-Sentence-Caption/Yes-Subfig",
    ("single_sentence", False): "Single-Sentence-Caption/No-Subfig",
    ("first_sentence", True): "First-Sentence/Yes-Subfig",
    ("first_sentence", False): "First-Sentence/No-Subfig",
    ("leq_100_tokens", True): "Caption-No-More-Than-100-Tokens/Yes-Subfig",
    ("leq_100_tokens", False): "Caption-No-More-Than-100-Tokens/No-Subfig",
}
_SUBFIG_TO_PATH = {True: "SciCap-Yes-Subfig-Img", False: "SciCap-No-Subfig-Img"}


class _Scicap(base.Builder):
  SPLITS = ("train", "val", "test")
  SUBSET = "first_sentence"
  SUBFIG = False

  def generate(self, split):
    ids_path = _CONFIG_TO_IDS_PATH[(self.SUBSET, self.SUBFIG)]
    img_dir = _SUBFIG_TO_PATH[self.SUBFIG]
    for fname in self.json("List-of-Files-for-Each-Experiments",
                           *ids_path.split("/"), split, "file_idx.json"):
      image_id = fname[:-len(".png")]
      ann = self.json("SciCap-Caption-All", split, image_id + ".json")
      norm = ann.get("2-normalized", {})
      lowercase = ann[
          "1-lowercase-and-token-and-remove-figure-index"]["caption"]
      yield {
          "image/id": image_id,
          "image/filename": fname,
          "image": base.File(self.path(img_dir, split, fname)),
          "caption": lowercase,
          "caption/originally_extracted": ann["0-originally-extracted"],
          "caption/lowercase_and_token_and_remove_figure_index": lowercase,
          "caption/normalized/basic_num": norm.get(
              "2-1-basic-num", {}).get("caption", ""),
          "caption/normalized/advanced_equation_bracket": norm.get(
              "2-2-advanced-euqation-bracket", {}).get("caption", ""),
      }


@base.register("scicap/first_sentence_subfig_no")
class ScicapFirstSentenceNoSubfig(_Scicap):
  SUBSET, SUBFIG = "first_sentence", False


@base.register("scicap/first_sentence_subfig_yes")
class ScicapFirstSentenceYesSubfig(_Scicap):
  SUBSET, SUBFIG = "first_sentence", True


@base.register("scicap/single_sentence_subfig_no")
class ScicapSingleSentenceNoSubfig(_Scicap):
  SUBSET, SUBFIG = "single_sentence", False


@base.register("scicap/leq_100_tokens_subfig_no")
class ScicapLeq100NoSubfig(_Scicap):
  SUBSET, SUBFIG = "leq_100_tokens", False
