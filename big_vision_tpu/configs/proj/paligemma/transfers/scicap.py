"""PaliGemma transfer to SciCap figure captioning.

Parity target: reference configs/proj/paligemma/transfers/scicap.py
(dataset/prompt/split/hyperparameter recipe). Requires the scicap
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


def get_config(arg=None):
  return c7n.caption_task_config(
      arg, data_name="scicap/first_sentence_subfig_no",
      suffix_pp="copy(inkey='caption', outkey='suffix')",
      train_split="train", final_train_split="train+val",
      eval_splits=[("minival", "val"), ("eval", "test")],
      captions_pp=("copy('caption', 'captions')",),
      text_len=96, total_epochs=80, lr=3e-5, wd=0.0,
      prefix_name="scicap")
