"""PaliGemma transfer to ActivityNet QA.

Parity target: reference configs/proj/paligemma/transfers/activitynet_qa.py
(dataset/prompt/split/hyperparameter recipe). Requires the activitynet_qa
dataset on disk in the bv:video layout (datasets/video.py) — pass
reader=bv:video[,data_dir=...] — or a user-supplied loader.
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


NUM_FRAMES = 8
DATASET_NAME = "activitynet_qa"


def training_data(res, *, final_split, num_frames=NUM_FRAMES,
                  stride=None, reader="", data_dir=""):
  """Video pp; the video reader itself must be supplied by the user.

  The reference ships these configs with a placeholder data loader too:
  the datasets are not in tfds, so users plug in their own DataSource.
  """
  cfg = c7n.parse_arg("")
  cfg.data = dict(name=reader or "<add_your_video_data_loader_here>",
                  dataset_name=DATASET_NAME, split="train",
                  num_frames=num_frames, stride=stride,
                  deterministic_fs=False)
  if data_dir:
    cfg.data["data_dir"] = data_dir
  cfg.pp = "|".join([
      f"video_decode({res})|video_replicate_img({num_frames},"
      f" {num_frames})",
      f"video_ensure_shape('image', {(num_frames, res, res, 3)})",
      "strfmt('answer en {question}', outkey='prefix')",
      "video_choice(inkey='answer', outkey='suffix')",
      c7n.combine_and_keep_train(32),
  ])
  return cfg


def get_config(arg=None):
  c = c7n.parse_arg(arg, mode="xm", res=224, final_split=False,
                    reader="", data_dir="")
  c.input = training_data(c.res, final_split=c.final_split,
                          reader=c.reader, data_dir=c.data_dir)
  c.evals = {}
  c7n.add_video_evals(
      c, training_data(c.res, final_split=True, reader=c.reader,
                       data_dir=c.data_dir),
      prefix_name=DATASET_NAME, task="qa", res=c.res,
      num_frames=NUM_FRAMES, skip_first_heavy=True)
  c7n.mkbase(c, res=c.res, total_epochs=1, lr=1e-5, wd=0.0)
  c.model.llm["vocab_size"] = 256_000 + 1024 + 128
  c.pp_modules += ["proj.paligemma.video"]
  if not c.reader:
    # Template contract, same as the reference: no reader configured.
    raise NotImplementedError(
        "Pass reader=bv:video (optionally data_dir=...) to use the native "
        "cv2/frame-dir video reader, or plug in a loader of choice.")
  return c
