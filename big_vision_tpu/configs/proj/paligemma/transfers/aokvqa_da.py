"""PaliGemma transfer to A-OK-VQA (direct answers).

Parity target: reference configs/proj/paligemma/transfers/aokvqa_da.py
(dataset/prompt/split/hyperparameter recipe). Requires the aokvqa
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


def get_config(arg=None):
  return c7n.vqa_task_config(
      arg, data_name="aokvqa",
      prefix="answer en {question}",
      suffix_pp=("choice_no_replacement(inkey='direct_answers',"
                 " outkey='suffix')"),
      train_split="train", final_train_split="train + val",
      eval_splits=[("minival", "val"), ("eval", "val")],
      eval_pp_extra=("copy(inkey='direct_answers', outkey='answers')",),
      total_epochs=10, lr=5e-6, wd=0.0, prefix_name="aokvqa_da")
