"""PaliGemma transfer to VizWiz-VQA.

Parity target: reference configs/proj/paligemma/transfers/vizwizvqa.py
(dataset/prompt/split/hyperparameter recipe). Requires the vizwizvqa
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


def get_config(arg=None):
  return c7n.vqa_task_config(
      arg, data_name="vizwizvqa",
      prefix="answer en {question}",
      suffix_pp="choice_no_replacement(inkey='answers', outkey='suffix')",
      train_split="train", final_train_split="train+val",
      eval_splits=[("minival", "val"), ("eval", "test")],
      total_epochs=10, lr=1e-5, wd=1e-6, text_len=48,
      prefix_name="vizwizvqa")
