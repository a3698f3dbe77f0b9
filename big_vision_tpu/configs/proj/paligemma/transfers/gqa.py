"""PaliGemma transfer to GQA (+ zero-shot xGQA).

Parity target: reference configs/proj/paligemma/transfers/gqa.py
(dataset/prompt/split/hyperparameter recipe). Requires the gqa
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


def get_config(arg=None):
  c = c7n.vqa_task_config(
      arg, data_name="gqa",
      prefix="answer en {question}",
      suffix_pp="copy(inkey='answer', outkey='suffix')",
      train_split="train_balanced",
      final_train_split="train_balanced+val_balanced",
      eval_splits=[("minival", "val_balanced"),
                   ("eval", "testdev_balanced")],
      eval_pp_extra=("copy(inkey='example_id', outkey='question_id')",),
      eval_keep=("answer", "question_id"),
      eval_kw=dict(out_question_key="question_id",
                   out_answer_key="prediction"),
      total_epochs=10, lr=1e-5, wd=1e-6, prefix_name="gqa")
  # Zero-shot xGQA: questions in other languages, answers in english.
  for lang in ("bn", "de", "en", "id", "ko", "pt", "ru", "zh"):
    c.evals[f"xgqa/eval_{lang}"] = dict(
        c.evals["gqa/eval"],
        data=dict(name="xgqa", split=f"test_zs_{lang}"))
  return c
