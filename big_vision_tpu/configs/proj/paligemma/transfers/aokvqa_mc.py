"""PaliGemma transfer to A-OK-VQA (multiple choice).

Parity target: reference configs/proj/paligemma/transfers/aokvqa_mc.py
(dataset/prompt/split/hyperparameter recipe). Requires the aokvqa
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


PREFIX = "answer en"
PROMPT = "Choose from:"
PROMPT_SEP = " \\n "


def get_config(arg=None):
  return c7n.vqa_task_config(
      arg, data_name="aokvqa",
      prefix=(PREFIX + " {question} " + PROMPT + " {ansstr}"),
      suffix_pp=("getidx(inkey='multiple_choice_possible_answers',"
                 " index_key='multiple_choice_correct_idx',"
                 " outkey='suffix')"),
      pp_before=(f"strjoin('{PROMPT_SEP}',"
                 " inkey='multiple_choice_possible_answers',"
                 " outkey='ansstr')",),
      train_split="train", final_train_split="train + val",
      eval_splits=[("minival", "val"), ("eval", "val")],
      eval_pp_extra=("getidx(inkey='multiple_choice_possible_answers',"
                     " index_key='multiple_choice_correct_idx',"
                     " outkey='answer')",),
      eval_keep=("answer", "question_id"),
      text_len=128, total_epochs=10, lr=5e-6, wd=0.0,
      prefix_name="aokvqa_mc")
