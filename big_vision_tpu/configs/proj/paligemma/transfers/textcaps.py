"""PaliGemma transfer to TextCaps.

Parity target: reference configs/proj/paligemma/transfers/textcaps.py
(dataset/prompt/split/hyperparameter recipe). Requires the text_caps
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


def get_config(arg=None):
  return c7n.caption_task_config(
      arg, data_name="text_caps",
      suffix_pp="choice_no_replacement(inkey='texts', outkey='suffix')",
      train_split="train[:98%]", final_train_split="train",
      eval_splits=[("minival", "train[-2%:]"), ("eval", "val")],
      captions_pp=("copy('texts', 'captions')",),
      total_epochs=5, lr=1e-5, wd=0.0, prefix_name="textcaps")
