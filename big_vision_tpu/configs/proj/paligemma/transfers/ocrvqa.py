"""PaliGemma transfer to OCR-VQA.

Parity target: reference configs/proj/paligemma/transfers/ocrvqa.py
(dataset/prompt/split/hyperparameter recipe). Requires the ocrvqa_id
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


def get_config(arg=None):
  return c7n.vqa_task_config(
      arg, data_name="ocrvqa_id",
      prefix="answer en {question}",
      suffix_pp="copy(inkey='answer', outkey='suffix')",
      train_split="train + val[20_000:]", final_train_split="train+val",
      eval_splits=[("minival", "val[:5120]"), ("eval", "test")],
      eval_pp_extra=("copy(inkey='int_id', outkey='question_id')",),
      eval_keep=("answer", "question_id"),
      eval_kw=dict(to_lower=True),
      total_epochs=3, lr=1e-5, wd=1e-6, prefix_name="ocrvqa")
