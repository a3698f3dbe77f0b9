"""PaliGemma transfer to VATEX captioning.

Parity target: reference configs/proj/paligemma/transfers/vatex_cap.py
(dataset/prompt/split/hyperparameter recipe). Requires the vatex_cap
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


NUM_FRAMES = 8


def training_data(res, *, final_split, num_frames=NUM_FRAMES,
                  stride=None):
  """Video pp; the video reader itself must be supplied by the user.

  The reference ships these configs with a placeholder data loader too:
  the datasets are not in tfds, so users plug in their own DataSource.
  """
  cfg = c7n.parse_arg("")
  cfg.data = dict(name="<add_your_video_data_loader_here>",
                  split="train", num_frames=num_frames, stride=stride)
  cfg.pp = "|".join([
      f"video_decode({res})|video_replicate_img({num_frames},"
      f" {num_frames})",
      f"video_ensure_shape('image', {(num_frames, res, res, 3)})",
      "strfmt('caption en', outkey='prefix')",
      "video_choice(inkey='caption/string', outkey='suffix')",
      c7n.combine_and_keep_train(32),
  ])
  return cfg


def get_config(arg=None):
  c = c7n.parse_arg(arg, mode="xm", res=224, final_split=False)
  c.input = training_data(c.res, final_split=c.final_split)
  c.evals = {}  # Add a coco_caption evaluator once a data loader exists.
  c7n.mkbase(c, res=c.res, total_epochs=1, lr=1e-5, wd=0.0)
  c.model.llm["vocab_size"] = 256_000 + 1024 + 128
  c.pp_modules += ["proj.paligemma.video"]
  raise NotImplementedError(
      "Plug in a video data loader (see docstring), then delete this.")
