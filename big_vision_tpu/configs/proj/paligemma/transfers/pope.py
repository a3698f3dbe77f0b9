"""PaliGemma transfer to POPE object-hallucination probing (eval-only).

Parity target: reference configs/proj/paligemma/transfers/pope.py
(dataset/prompt/split/hyperparameter recipe). Requires the pope
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


DATASETS = ("pope/random", "pope/popular", "pope/adversarial")


def get_config(arg=None):
  c = c7n.parse_arg(arg, mode="xm", res=224, text_len=48,
                    prefix="{question}")
  # POPE is evaluation-only: train with lr=0 on the test split just to
  # drive the eval loop (matches the reference config).
  c.input = c7n.parse_arg("")
  c.input.data = dict(name=DATASETS[0], split="test")
  c.input.pp = "|".join([
      "decode", f"resize({c.res})", "value_range(-1, 1)",
      f"strfmt({c.prefix!r}, outkey='prefix')",
      "copy(inkey='answer', outkey='suffix')",
      c7n.combine_and_keep_train(c.text_len),
  ])

  c.evals = {}
  pp_eval = "|".join([
      "decode", f"resize({c.res})", "value_range(-1, 1)",
      f"strfmt({c.prefix!r}, outkey='prefix')",
      c7n.combine_and_keep_eval(c.text_len,
                                keep=("question_id", "answer")),
  ])
  for ds in DATASETS:
    c.evals[f"{ds.replace('/', '_')}/eval"] = dict(
        type="proj.paligemma.transfers.pope",
        pred="decode", pred_kw={"max_decode_len": c.text_len},
        log_percent=0.5, tokenizer=c7n.TOKENIZER,
        data=dict(name=ds, split="test"), pp_fn=pp_eval)

  c7n.mkbase(c, res=c.res, total_epochs=1, lr=0.0, wd=0.0)
  if c.mode == "runlocal":
    c7n.shrink_for_runlocal(c)
  return c
