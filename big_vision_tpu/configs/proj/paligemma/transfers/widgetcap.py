"""PaliGemma transfer to WidgetCap widget captioning.

Parity target: reference configs/proj/paligemma/transfers/widgetcap.py
(dataset/prompt/split/hyperparameter recipe). Requires the widgetcap
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


def get_config(arg=None):
  return c7n.caption_task_config(
      arg, data_name="widgetcap",
      suffix_pp="choice_no_replacement(inkey='texts', outkey='suffix')",
      # The bounding box of the widget is drawn into the image.
      pp_before=("draw_bbox",),
      train_split="train", final_train_split="train+dev",
      eval_splits=[("minival", "dev"), ("eval", "test")],
      captions_pp=("copy('texts', 'captions')",),
      total_epochs=10, lr=1e-5, wd=0.0, prefix_name="widgetcap")
