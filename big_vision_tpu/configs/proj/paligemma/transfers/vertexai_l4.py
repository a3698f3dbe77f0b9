"""PaliGemma transfer to small-accelerator finetuning.

Parity target: reference configs/proj/paligemma/transfers/vertexai_l4.py
(dataset/prompt/split/hyperparameter recipe). Requires the bv:jsonl
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


"""Minimal single-accelerator finetune (head-only, frozen backbone)."""


def get_config(arg=None):
  c = c7n.parse_arg(arg, res=224, text_len=128, batch_size=4)
  c.input = c7n.parse_arg("")
  c.input.data = dict(name="jsonl", fname="data_train90.jsonl",
                      fopen_keys={"image": ""})
  c.input.pp = "|".join([
      "decode", f"resize({c.res})", "value_range(-1, 1)",
      "strfmt('caption en', outkey='prefix')",
      c7n.combine_and_keep_train(c.text_len),
  ])
  c.evals = {}
  c7n.mkbase(c, res=c.res, total_epochs=1, lr=0.1, wd=0.0,
             batch_size=c.batch_size)
  # Train only the embeddings on a small accelerator.
  c.schedule = [
      (".*img/.*", None), (".*llm/layers/.*", None),
      (".*", dict(decay_type="cosine", warmup_percent=0.05)),
  ]
  return c
