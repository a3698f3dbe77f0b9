"""PaliGemma transfer to VQAv2.

Parity target: reference configs/proj/paligemma/transfers/vqav2.py
(dataset/prompt/split/hyperparameter recipe). Requires the vqa
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


def get_config(arg=None):
  c = c7n.vqa_task_config(
      arg, data_name="vqa",
      prefix="answer en {question_text}",
      suffix_pp="choice_no_replacement(inkey='answers', outkey='suffix')",
      train_split="train + validation[:-10240]",
      final_train_split="train + validation",
      eval_splits=[("minival", "validation[-10240:]"),
                   ("eval", "validation[-10240:]")],
      eval_type="vqav2",
      eval_keep=("answers", "answer_type", "question_type", "question_id"),
      total_epochs=10, lr=1e-5, wd=1e-6, prefix_name="vqav2")
  return c


def sweep_best(add, arg=None):
  c = c7n.parse_arg(arg, final_split=False)
  add(total_epochs=10, lr=1e-5, wd=1e-6, **c7n.arg(res=224, **c))
  add(total_epochs=10, lr=1e-5, wd=0.00, **c7n.arg(res=448, **c))


sweep = sweep_best
