"""PaliGemma transfer to COCO captions.

Parity target: reference configs/proj/paligemma/transfers/cococap.py
(dataset/prompt/split/hyperparameter recipe). Requires the coco_captions
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


def get_config(arg=None):
  return c7n.caption_task_config(
      arg, data_name="coco_captions",
      suffix_pp=("choice_no_replacement(inkey='captions/text',"
                 " outkey='suffix')"),
      pp_before=("flatten",),
      train_split="train[:98%]+restval",
      final_train_split="train+restval",
      eval_splits=[("minitrain", "train[:2%]"),
                   ("minival", "train[-2%:]"), ("eval", "val")],
      captions_pp=("flatten", "copy('captions/text', 'captions')"),
      total_epochs=5, lr=1e-5, wd=1e-6, prefix_name="cococap")
