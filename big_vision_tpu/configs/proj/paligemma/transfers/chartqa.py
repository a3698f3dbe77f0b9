"""PaliGemma transfer to ChartQA (relaxed accuracy).

Parity target: reference configs/proj/paligemma/transfers/chartqa.py
(dataset/prompt/split/hyperparameter recipe). Requires the chartqa
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


DATASETS = ("chartqa/human", "chartqa/augmented")


def get_config(arg=None):
  c = c7n.parse_arg(arg, mode="xm", res=448, final_split=False)
  text_len = 48

  def mkdata(ds, final):
    cfg = c7n.parse_arg("")
    cfg.data = dict(name=ds, split="train+val" if final else "train")
    cfg.pp = "|".join([
        "decode", f"resize({c.res})", "value_range(-1, 1)",
        "copy(inkey='question', outkey='prefix')",
        "copy(inkey='answer', outkey='suffix')",
        c7n.combine_and_keep_train(text_len),
    ])
    return cfg

  # Train on a weighted mixture of the human and augmented subsets.
  c.input = c7n.parse_arg("")
  c.input.data = [(1.0, dict(mkdata(ds, c.final_split)))
                  for ds in DATASETS]
  c.input.pp = mkdata(DATASETS[0], c.final_split).pp

  c.evals = {}
  pp_eval = "|".join([
      "decode", f"resize({c.res})", "value_range(-1, 1)",
      "copy(inkey='question', outkey='prefix')",
      c7n.combine_and_keep_eval(text_len, keep=("answer",
                                                "question_id")),
  ])
  for ds in DATASETS:
    for name, split in [("minival", "val"), ("eval", "test")]:
      c.evals[f"{ds.replace('/', '_')}/{name}"] = dict(
          type="proj.paligemma.transfers.chartqa", to_lower=True,
          pred="decode", pred_kw={"max_decode_len": text_len},
          log_percent=0.1, tokenizer=c7n.TOKENIZER,
          data=dict(name=ds, split=split), pp_fn=pp_eval)

  c7n.mkbase(c, res=c.res, total_epochs=30, lr=1e-5, wd=1e-6)
  if c.mode == "runlocal":
    c7n.shrink_for_runlocal(c)
  return c
