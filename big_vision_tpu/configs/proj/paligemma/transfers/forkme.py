"""PaliGemma transfer to your own dataset (tutorial template).

Parity target: reference configs/proj/paligemma/transfers/forkme.py
(dataset/prompt/split/hyperparameter recipe). Requires the bv:jsonl
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


"""This is additionally the tutorial config: fork it for your own task."""


def get_config(arg=None):
  c = c7n.parse_arg(arg, res=224, text_len=128, batch_size=32,
                    mode="xm")
  c.input = c7n.parse_arg("")
  # A 90-image long-caption dataset stored as jsonl; the data layer reads
  # it with the native bv:jsonl source (no tfds needed).
  c.input.data = dict(name="jsonl", fname="data_train90.jsonl",
                      fopen_keys={"image": ""})
  c.input.pp = "|".join([
      "decode", f"resize({c.res})", "value_range(-1, 1)",
      "strfmt('caption en', outkey='prefix')",
      "copy(inkey='suffix', outkey='suffix')",
      c7n.combine_and_keep_train(c.text_len),
  ])

  c.evals = {}
  pp_eval = "|".join([
      "decode", f"resize({c.res})", "value_range(-1, 1)",
      "strfmt('caption en', outkey='prefix')",
      c7n.combine_and_keep_eval(c.text_len, keep=("id",)),
  ])
  c.evals["val/pplx"] = dict(
      type="proj.paligemma.perplexity", pred="logits",
      key="text", shift_labels=True, log_percent=0.1,
      data=dict(name="jsonl", fname="data_val10.jsonl",
                fopen_keys={"image": ""}),
      pp_fn=c.input.pp)
  c.evals["val/store"] = dict(
      type="proj.paligemma.transfers.storepreds",
      pred="decode", pred_kw={"max_decode_len": c.text_len},
      log_percent=0.5, tokenizer=c7n.TOKENIZER, id_key="id",
      data=dict(name="jsonl", fname="data_val10.jsonl",
                fopen_keys={"image": ""}),
      pp_fn=pp_eval)

  c7n.mkbase(c, res=c.res, total_epochs=15, lr=1e-5, wd=3e-7,
             batch_size=c.batch_size)
  if c.mode == "runlocal":
    c7n.shrink_for_runlocal(c)
  return c
