"""PaliGemma transfer to TallyQA counting (+ CountBenchQA).

Parity target: reference configs/proj/paligemma/transfers/tallyqa.py
(dataset/prompt/split/hyperparameter recipe). Requires the tallyqa
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


def get_config(arg=None):
  c = c7n.vqa_task_config(
      arg, data_name="tallyqa",
      prefix="answer en {question}",
      suffix_pp="strfmt('{answer}', outkey='suffix')",
      train_split="train", final_train_split="train",
      eval_splits=[("minitrain", "train[:5%]"), ("eval", "test")],
      eval_type="tallyqa",
      eval_pp_extra=("strfmt('{answer}', outkey='answer')",),
      eval_keep=("answer", "issimple"),
      total_epochs=5, lr=1e-5, wd=1e-6, prefix_name="tallyqa")
  # Zero-shot CountBenchQA on the same checkpoint.
  c.evals["countbenchqa/eval"] = dict(
      c.evals["tallyqa/eval"],
      data=dict(name="countbenchqa", split="huggingface"))
  return c
