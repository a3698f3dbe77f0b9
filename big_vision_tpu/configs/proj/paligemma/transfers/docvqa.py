"""PaliGemma transfer to DocVQA (ANLS).

Parity target: reference configs/proj/paligemma/transfers/docvqa.py
(dataset/prompt/split/hyperparameter recipe). Requires the docvqa
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


def get_config(arg=None):
  return c7n.vqa_task_config(
      arg, data_name="docvqa",
      prefix="{question}",
      suffix_pp="choice(inkey='answers', outkey='suffix')",
      train_split="train[:-5%]", final_train_split="train+val",
      eval_splits=[("minival", "train[-5%:]"), ("eval", "val")],
      eval_kw=dict(outfile="{workdir}/docvqa_{split}.json",
                   out_question_key="questionId"),
      total_epochs=10, lr=1e-5, wd=1e-6, res_default=896,
      prefix_name="docvqa")
