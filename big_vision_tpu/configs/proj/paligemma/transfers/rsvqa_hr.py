"""PaliGemma transfer to RSVQA high-res (remote sensing).

Parity target: reference configs/proj/paligemma/transfers/rsvqa_hr.py
(dataset/prompt/split/hyperparameter recipe). Requires the rsvqa_hr
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


def get_config(arg=None):
  return c7n.vqa_task_config(
      arg, data_name="rsvqa_hr/nonum",
      prefix="answer en {question}",
      suffix_pp="choice_no_replacement(inkey='answers', outkey='suffix')",
      pp_before=("lower(key='answers')",),
      train_split="train", final_train_split="train + val",
      eval_splits=[("minival", "val"), ("eval", "test"),
                   ("eval_phili", "test_phili")],
      eval_type="rsvqa",
      eval_keep=("answers", "question_id", "question_type"),
      total_epochs=10, lr=1e-5, wd=1e-6, prefix_name="rsvqa_hr")
