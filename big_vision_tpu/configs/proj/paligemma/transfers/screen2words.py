"""PaliGemma transfer to Screen2Words UI summarization.

Parity target: reference configs/proj/paligemma/transfers/screen2words.py
(dataset/prompt/split/hyperparameter recipe). Requires the screen2_words
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


def get_config(arg=None):
  return c7n.caption_task_config(
      arg, data_name="screen2_words",
      suffix_pp="choice_no_replacement(inkey='summary', outkey='suffix')",
      train_split="train", final_train_split="train+dev",
      eval_splits=[("minival", "dev"), ("eval", "test")],
      captions_pp=("copy('summary', 'captions')",),
      text_len=24, total_epochs=10, lr=1e-5, wd=0.0,
      prefix_name="screen2words")
