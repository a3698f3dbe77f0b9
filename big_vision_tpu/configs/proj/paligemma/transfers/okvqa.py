"""PaliGemma transfer to OK-VQA.

Parity target: reference configs/proj/paligemma/transfers/okvqa.py
(dataset/prompt/split/hyperparameter recipe). Requires the okvqa
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


def get_config(arg=None):
  return c7n.vqa_task_config(
      arg, data_name="okvqa",
      prefix="answer en {question}",
      suffix_pp="choice_no_replacement(inkey='answers', outkey='suffix')",
      train_split="train[:-10%]", final_train_split="train",
      eval_splits=[("minival", "train[-10%:]"), ("eval", "val")],
      total_epochs=10, lr=5e-6, wd=0.0, prefix_name="okvqa")
