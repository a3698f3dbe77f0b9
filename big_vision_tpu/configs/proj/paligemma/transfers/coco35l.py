"""PaliGemma transfer to COCO-35L multilingual captioning (+ XM3600 eval).

Parity target: reference configs/proj/paligemma/transfers/coco35l.py
(dataset/prompt/split/hyperparameter recipe). Requires the coco35l
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


LANGUAGES = (
    "ar", "bn", "cs", "da", "de", "el", "en", "es", "fa", "fi", "fil",
    "fr", "he", "hi", "hr", "hu", "id", "it", "ja", "ko", "mi", "nl",
    "no", "pl", "pt", "ro", "ru", "sv", "sw", "te", "th", "tr", "uk",
    "vi", "zh")


def get_config(arg=None):
  c = c7n.parse_arg(arg, mode="xm", res=224, lang="")
  langs = [c.lang] if c.lang else LANGUAGES

  c.input = c7n.parse_arg("")
  c.input.data = dict(
      name="coco35l",
      split="+".join(f"train_{l}" for l in langs))
  c.input.pp = "|".join([
      "decode", f"resize({c.res})", "value_range(-1, 1)",
      "choice_no_replacement(inkey='captions', outkey='suffix')",
      "strfmt('caption {language}', outkey='prefix')",
      c7n.combine_and_keep_train(32),
  ])

  c.evals = {}
  for lang in langs[:4] if not c.lang else langs:
    pp_eval = "|".join([
        "decode", f"resize({c.res})", "value_range(-1, 1)",
        f"strfmt('caption {lang}', outkey='prefix')",
        "copy('captions', 'captions')",
        c7n.combine_and_keep_eval(32, keep=("image/id", "captions")),
    ])
    c.evals[f"coco35l/dev_{lang}"] = dict(
        type="proj.paligemma.transfers.coco_caption",
        pred="decode", pred_kw={"max_decode_len": 32},
        log_percent=0.25, tokenizer=c7n.TOKENIZER,
        data=dict(name="coco35l", split=f"dev_{lang}"), pp_fn=pp_eval)
    c.evals[f"xm3600/{lang}"] = dict(
        c.evals[f"coco35l/dev_{lang}"],
        data=dict(name="xm3600", split=lang))

  c7n.mkbase(c, res=c.res, total_epochs=5, lr=1e-5, wd=0.0)
  if c.mode == "runlocal":
    c7n.shrink_for_runlocal(c)
  return c
