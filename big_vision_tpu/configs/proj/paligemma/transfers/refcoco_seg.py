"""PaliGemma transfer to RefCOCO referring-expression segmentation.

Parity target: reference configs/proj/paligemma/transfers/refcoco_seg.py
(dataset/prompt/split/hyperparameter recipe). Requires the ref_coco_bv
dataset to be available to the data layer (tfds-gated in this image).
"""

from big_vision_tpu.configs.proj.paligemma.transfers import common as c7n


def get_config(arg=None):
  c = c7n.parse_arg(arg, mode="xm", res=448, crop="rs")
  text_len = 48
  c.input = c7n.parse_arg("")
  c.input.data = dict(name="ref_coco_bv/refcocox_combined:1.4.0",
                      split="train")
  c.input.pp = "|".join([
      # One (mask, bbox, sentence) triple per example, then render the
      # mask+box as <loc>/<seg> token strings.
      "choice_no_replacement(key=['objects/mask', 'objects/bbox',"
      " 'objects/refs/sentence'])",
      "choice(key=['objects/refs/sentence'])",
      "refcoco_mask2str",
      "copy(inkey='objects/refs/sentence', outkey='prefix')",
      "decode", c7n.crop_pp(c.res, c.crop), "value_range(-1, 1)",
      c7n.combine_and_keep_train(text_len),
  ])

  c.evals = {}
  pp_eval = "|".join([
      "choice(key=['objects/mask', 'objects/bbox',"
      " 'objects/refs/sentence'])",
      "choice(key=['objects/refs/sentence'], outkey='prefix')",
      "decode", f"resize({c.res})", "value_range(-1, 1)",
      c7n.combine_and_keep_eval(
          text_len, keep=("objects/mask", "objects/bbox")),
  ])
  for name, ds_name, split in [
      ("refcoco/val", "ref_coco_bv/refcoco_unc:1.4.0", "validation"),
      ("refcoco+/val", "ref_coco_bv/refcocoplus_unc:1.4.0",
       "validation"),
      ("refcocog/val", "ref_coco_bv/refcocog_umd:1.4.0", "validation"),
  ]:
    c.evals[name] = dict(
        type="proj.paligemma.transfers.segmentation",
        pred="decode", pred_kw={"max_decode_len": text_len},
        log_percent=0.25, tokenizer=c7n.TOKENIZER,
        data=dict(name=ds_name, split=split), pp_fn=pp_eval)

  c7n.mkbase(c, res=c.res, total_epochs=100, lr=1e-5, wd=0.0,
             label_smoothing=0.3)
  c.pp_modules += ["proj.paligemma.segmentation"]
  if c.mode == "runlocal":
    c7n.shrink_for_runlocal(c)
  return c
