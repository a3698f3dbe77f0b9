"""PaliGemma transfer to TextVQA.

Parity target: reference configs/proj/paligemma/transfers/textvqa.py
(dataset/prompt/split/hyperparameter recipe). Requires the textvqa
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


def get_config(arg=None):
  return c7n.vqa_task_config(
      arg, data_name="textvqa",
      prefix="answer en {question}",
      suffix_pp="choice_no_replacement(inkey='answers', outkey='suffix')",
      train_split="train", final_train_split="train+val",
      eval_splits=[("minival", "val"), ("eval", "test")],
      eval_type="vqav2",
      eval_pp_extra=("strfmt('other', outkey='answer_type')",),
      eval_keep=("answers", "answer_type", "question_id"),
      total_epochs=5, lr=3e-6, wd=0.0, prefix_name="textvqa")
