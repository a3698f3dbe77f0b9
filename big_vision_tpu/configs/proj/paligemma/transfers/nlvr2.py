"""PaliGemma transfer to NLVR2 (two-image reasoning).

Parity target: reference configs/proj/paligemma/transfers/nlvr2.py
(dataset/prompt/split/hyperparameter recipe). Requires the nlvr2
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


def get_config(arg=None):
  num_frames = 2

  def mk(c):
    res = c.res
    return (
        "decode(key='image_left')|decode(key='image_right')",
        f"resize({res}, key='image_left')|resize({res}, key='image_right')",
        "stack_images(inkeys=['image_left', 'image_right'],"
        " outkey='image')",
        f"video_ensure_shape('image', {(num_frames, -1, -1, 3)})",
        "value_range(-1, 1)")

  c = c7n.parse_arg(arg, mode="xm", res=224, final_split=False)
  before = mk(c)
  c.input = c7n.parse_arg("")
  c.input.data = dict(
      name="nlvr2",
      split="train+dev" if c.final_split else "train")
  c.input.pp = "|".join([
      *before,
      "strfmt('answer en {sentence}', outkey='prefix')",
      "copy(inkey='label', outkey='suffix')",
      c7n.combine_and_keep_train(64),
  ])
  c.evals = {}
  pp_eval = "|".join([
      *before,
      "strfmt('answer en {sentence}', outkey='prefix')",
      "copy(inkey='label', outkey='answer')",
      c7n.combine_and_keep_eval(64, keep=("answer", "question_id")),
  ])
  for name, split in [("minival", "dev"), ("eval", "test")]:
    c.evals[f"nlvr2/{name}"] = dict(
        type="proj.paligemma.transfers.vqa",
        pred="decode", pred_kw={"max_decode_len": 64},
        log_percent=0.1, tokenizer=c7n.TOKENIZER,
        data=dict(name="nlvr2", split=split), pp_fn=pp_eval)
  c7n.mkbase(c, res=c.res, total_epochs=5, lr=1e-5, wd=1e-6)
  c.pp_modules += ["proj.paligemma.video"]
  if c.mode == "runlocal":
    c7n.shrink_for_runlocal(c)
  return c
