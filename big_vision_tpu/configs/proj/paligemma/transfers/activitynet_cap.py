"""PaliGemma transfer to ActivityNet captioning.

Parity target: reference configs/proj/paligemma/transfers/activitynet_cap.py
(dataset/prompt/split/hyperparameter recipe). Requires the activitynet_cap
dataset on disk in the bv:video layout (datasets/video.py) — pass
reader=bv:video[,data_dir=...] — or a user-supplied loader.
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


NUM_FRAMES = 8
DATASET_NAME = "activitynet_captions_mr"
# Published split sizes (reference activitynet_cap.py:29); weights for the
# final_split train+valid mixture.
SPLIT_SIZE = {'train': 30545, 'valid': 14338, 'test': 13982}


def training_data(res, *, final_split, num_frames=NUM_FRAMES,
                  stride=None, reader="", data_dir=""):
  """Video pp over the DMVR-contract reader (native: bv:video).

  The reference ships these configs with a placeholder data loader;
  `final_split` trains on train+valid weighted by SPLIT_SIZE, like the
  reference's multi-split data dict.
  """
  return c7n.video_training_data(
      res, dataset_name=DATASET_NAME, split_size=SPLIT_SIZE,
      final_split=final_split, num_frames=num_frames, stride=stride,
      reader=reader, data_dir=data_dir, task_pp=[
      "strfmt('caption en', outkey='prefix')",
      "video_choice(inkey='caption/string', outkey='suffix')",
      ])


def get_config(arg=None):
  c = c7n.parse_arg(arg, mode="xm", res=224, final_split=False,
                    reader="", data_dir="")
  c.input = training_data(c.res, final_split=c.final_split,
                          reader=c.reader, data_dir=c.data_dir)
  c.evals = {}
  c7n.add_video_evals(
      c, training_data(c.res, final_split=False, reader=c.reader,
                       data_dir=c.data_dir),
      prefix_name=DATASET_NAME, task="cap", res=c.res,
      num_frames=NUM_FRAMES, pplx_splits=("minitrain",))
  c7n.mkbase(c, res=c.res, total_epochs=1, lr=1e-5, wd=0.0)
  c.model.llm["vocab_size"] = 256_000 + 1024 + 128
  c.pp_modules += ["proj.paligemma.video"]
  if not c.reader:
    # Template contract, same as the reference: no reader configured.
    raise NotImplementedError(
        "Pass reader=bv:video (optionally data_dir=...) to use the native "
        "cv2/frame-dir video reader, or plug in a loader of choice.")
  return c
