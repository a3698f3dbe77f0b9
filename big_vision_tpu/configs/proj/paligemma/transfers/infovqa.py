"""PaliGemma transfer to InfographicVQA.

Parity target: reference configs/proj/paligemma/transfers/infovqa.py
(dataset/prompt/split/hyperparameter recipe). Requires the infovqa
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


def get_config(arg=None):
  return c7n.vqa_task_config(
      arg, data_name="infovqa",
      prefix="answer en {question}",
      suffix_pp="choice_no_replacement(inkey='answers', outkey='suffix')",
      pp_before=("lower(key='answers')",),
      train_split="train", final_train_split="train+val",
      eval_splits=[("minival", "val"), ("eval", "test")],
      eval_kw=dict(out_question_key="questionId", out_answer_key="answer"),
      text_len=48, total_epochs=3, lr=1e-5, wd=1e-6, res_default=896,
      prefix_name="infovqa")
