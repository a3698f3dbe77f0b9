"""PaliGemma transfer to AI2D diagram multiple choice.

Parity target: reference configs/proj/paligemma/transfers/ai2d.py
(dataset/prompt/split/hyperparameter recipe). Requires the ai2d
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


PREFIX = "answer en"
PROMPT = "Choose from:"
PROMPT_SEP = " \\n "


def get_config(arg=None):
  return c7n.vqa_task_config(
      arg, data_name="ai2d",
      prefix=(PREFIX + " {question} " + PROMPT + " {ansstr}"),
      suffix_pp=("getidx(inkey='possible_answers',"
                 " index_key='correct_answer_idx', outkey='suffix')"),
      pp_before=(f"strjoin('{PROMPT_SEP}', inkey='possible_answers',"
                 " outkey='ansstr')",),
      train_split="train[:-1024]", final_train_split="train",
      eval_splits=[("minival", "train[-1024:]"), ("eval", "test")],
      eval_pp_extra=("getidx(inkey='possible_answers',"
                     " index_key='correct_answer_idx',"
                     " outkey='answer')",),
      eval_keep=("answer", "question_id"),
      text_len=128, total_epochs=10, lr=1e-5, wd=1e-6,
      prefix_name="ai2d")
