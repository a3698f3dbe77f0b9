"""Shared recipe for all PaliGemma transfer configs.

Parity target: reference configs/proj/paligemma/transfers/common.py
(combine_and_keep_train/eval :30-66) plus the boilerplate every transfer
config repeats (model/optimizer/mesh sections) factored into `mkbase`.
"""

import big_vision_tpu.configs.common as bvcc

TOKENIZER = 'gemma(tokensets=("loc", "seg"))'


def tok(**kw):
  """Tokenization pp-op string with the shared tokenizer default."""
  kw.setdefault("model", TOKENIZER)
  kw = ", ".join(f"{k}={v!r}" for k, v in kw.items())
  return f"tok({kw})"


def combine_and_keep_train(text_len, before=(), sep="\n"):
  """prefix+sep+suffix -> text/mask_ar/mask_loss, padded to text_len+1."""
  return "|".join([
      *before,
      tok(key="prefix", bos="yes"),
      tok(key="suffix", eos="yes"),
      tok(key="septok", text=sep),
      ("masked_concat(['prefix', 'septok', 'suffix'], outkey='text',"
       " mask_ar=[0, 0, 1], mask_loss=[0, 0, 1])"),
      # +1 because the trainer removes EOS.
      f"tolen({text_len + 1}, pad_value=0, key='text')",
      f"tolen({text_len + 1}, pad_value=1, key='mask_ar')",
      f"tolen({text_len + 1}, pad_value=0, key='mask_loss')",
      "keep('image', 'text', 'mask_ar', 'mask_loss')",
  ])


def combine_and_keep_eval(text_len, keep=(), before=(), sep="\n"):
  """Same, but suffix defaults empty (or continues decoding from it)."""
  return "|".join([
      *before,
      tok(key="prefix", bos="yes"),
      tok(key="septok", text=sep),
      "setdefault('suffix', '')",
      tok(key="suffix", eos="no"),
      ("masked_concat(['prefix', 'septok', 'suffix'], outkey='text',"
       " mask_ar=[0, 0, 1], mask_input=[1, 1, 1])"),
      f"tolen({text_len}, pad_value=0, key='text')",
      f"tolen({text_len}, pad_value=1, key='mask_ar')",
      f"tolen({text_len}, pad_value=0, key='mask_input')",
      "keep(" + ", ".join(
          f"'{x}'" for x in
          ("image", "text", "mask_ar", "mask_input") + tuple(keep)) + ")",
  ])


def crop_pp(res, crop):
  """Named crop recipes shared by the caption/VQA transfers."""
  return {
      "ic": f"inception_crop({res}, area_min=50)",
      "rc": f"resize_small({res * 8 // 7})|random_crop({res})",
      "rs": f"resize({res})",
  }[crop]


def mkbase(c, *, res, total_epochs, lr, wd, batch_size=256,
           label_smoothing=0.0, b2=0.999):
  """Fills the sections every transfer config shares."""
  c.total_epochs = total_epochs
  c.input.batch_size = batch_size
  c.optax_name = "scale_by_adam"
  c.optax = dict(b2=b2)
  c.lr = lr
  c.wd = wd
  c.grad_clip_norm = 1.0
  c.label_smoothing = label_smoothing
  c.schedule = dict(decay_type="cosine", warmup_percent=0.05)

  c.model_name = "proj.paligemma.paligemma"
  c.model = {}
  c.model.img = dict(variant="So400m/14", pool_type="none", scan=True)
  c.model.llm = dict(vocab_size=256_000 + 1024 + 128, dropout=0.0)
  c.model_init = f"pt_{res}"

  c.mesh = [("data", -1)]
  c.sharding_strategy = [(".*", 'fsdp(axis="data")')]
  c.sharding_rules = [("act_batch", ("data",))]

  c.input.shuffle_buffer_size = 50_000
  c.log_training_steps = 50
  c.ckpt_steps = 1_000
  c.pp_modules = ["ops_general", "ops_image", "ops_text",
                  "proj.paligemma.ops"]
  c.seed = 0
  return c


def shrink_for_runlocal(c):
  """Small-footprint overrides for local debugging runs."""
  c.input.shuffle_buffer_size = None
  for ev in c.evals.values():
    ev["data"]["split"] = ev["data"]["split"].split("[")[0] + "[:16]"
  c.log_training_steps = 1
  c.input.batch_size = 2
  return c


def add_eval_pplx(c, train_data, splits, prefix):
  """Perplexity evaluators over the given (name, split) pairs."""
  for name, split in splits:
    c.evals[f"{prefix}/{name}/pplx"] = dict(
        type="proj.paligemma.perplexity", pred="logits",
        key="text", shift_labels=True, log_percent=0.05,
        data={**train_data["data"], "split": split},
        pp_fn=train_data["pp"])


def video_training_data(res, *, dataset_name, task_pp, split_size=None,
                        final_split=False, num_frames=8, stride=None,
                        reader="", data_dir="", text_len=32):
  """Input section shared by the six video transfers.

  Mirrors the reference's per-config training_data (e.g. reference
  configs/proj/paligemma/transfers/msrvtt_qa.py:33-82): `final_split`
  trains on train+valid, weighted by the published split sizes, exactly
  like the reference's multi-split data dict.
  """
  cfg = parse_arg("")

  def split_data(split):
    d = dict(name=reader or "<add_your_video_data_loader_here>",
             dataset_name=dataset_name, split=split,
             num_frames=num_frames, stride=stride,
             deterministic_fs=False)
    if data_dir:
      d["data_dir"] = data_dir
    return d

  if final_split:
    split_size = split_size or {"train": 1, "valid": 1}
    cfg.data = [(split_size["train"], split_data("train")),
                (split_size["valid"], split_data("valid"))]
  else:
    cfg.data = split_data("train")
  cfg.pp = "|".join([
      f"video_decode({res})|video_replicate_img({num_frames},"
      f" {num_frames})",
      f"video_ensure_shape('image', {(num_frames, res, res, 3)})",
      *task_pp,
      combine_and_keep_train(text_len),
  ])
  return cfg


def add_video_evals(c, train_cfg, *, prefix_name, task, res,
                    num_frames, text_len=32, first_k_shards=2,
                    skip_first_heavy=False, pplx_splits=("minitrain",
                                                         "minival")):
  """Decode + perplexity evaluators for the six video transfers.

  Mirrors the reference's shared eval table (e.g. reference
  configs/proj/paligemma/transfers/msrvtt_qa.py:100-115 add_eval /
  add_eval_pplx): minitrain/minival on the first shards every ~eighth of
  the run, full val/eval once. `task` is "qa" (vqa EM/ANLS scoring) or
  "cap" (coco_caption CIDEr/BLEU scoring).
  """
  decode_chain = [
      f"video_decode({res})|video_replicate_img({num_frames},"
      f" {num_frames})",
      f"video_ensure_shape('image', {(num_frames, res, res, 3)})",
  ]
  if task == "qa":
    eval_type = "proj.paligemma.transfers.vqa"
    pp = "|".join([
        *decode_chain,
        "strfmt('answer en {question}', outkey='prefix')",
        # One GT answer per example (the QA sets are single-answer; the
        # reference reshapes [1]->[] the same way, ref msrvtt_qa.py:96).
        "video_choice(inkey='answer', outkey='answer')",
        "copy('example/video_id', 'question_id')",
        combine_and_keep_eval(text_len, keep=("question_id", "answer")),
    ])
  elif task == "cap":
    eval_type = "proj.paligemma.transfers.coco_caption"
    pp = "|".join([
        *decode_chain,
        "strfmt('caption en', outkey='prefix')",
        "copy('example/video_id', 'image/id')",
        "copy('caption/string', 'captions')",
        combine_and_keep_eval(text_len, keep=("image/id", "captions")),
    ])
  else:
    raise ValueError(f"unknown video eval task {task!r}")

  for freq, name, split, fks, skip_first in [
      (1 / 8, "minitrain", "train", first_k_shards, False),
      (1 / 4, "minival", "valid", first_k_shards, False),
      (1, "val", "valid", None, skip_first_heavy),
      (1, "eval", "test", None, skip_first_heavy),
  ]:
    c.evals[f"{prefix_name}/{name}"] = dict(
        type=eval_type,
        pred="decode", pred_kw={"max_decode_len": text_len},
        data={**train_cfg.data, "split": split,
              "first_k_shards": fks, "deterministic_fs": True},
        log_percent=freq, tokenizer=TOKENIZER,
        pp_fn=pp, skip_first=skip_first)

  for name in pplx_splits:
    split = {"minitrain": "train", "minival": "valid"}[name]
    c.evals[f"{prefix_name}/{name}/pplx"] = dict(
        type="proj.paligemma.perplexity", pred="logits",
        key="text", shift_labels=True, log_percent=1 / 8,
        data={**train_cfg.data, "split": split,
              "first_k_shards": first_k_shards,
              "deterministic_fs": True},
        pp_fn=train_cfg.pp)


def vqa_task_config(arg, *, data_name, prefix, suffix_pp, train_split,
                    final_train_split, eval_splits, eval_type="vqa",
                    eval_keep=("answers", "question_id"), text_len=32,
                    total_epochs=10, lr=1e-5, wd=1e-6, pp_before=(),
                    eval_pp_extra=(), eval_kw=None, res_default=224,
                    prefix_name="task"):
  """One-stop builder for the VQA-style transfers (shared skeleton).

  Each transfer file remains its own module (inventory parity with the
  reference configs/proj/paligemma/transfers/*) but delegates the
  repetitive plumbing here.
  """
  c = bvcc.parse_arg(arg, mode="xm", res=res_default, final_split=False)

  def training_data(final_split):
    cfg = bvcc.parse_arg("")
    cfg.data = dict(
        name=data_name,
        split=final_train_split if final_split else train_split)
    cfg.pp = "|".join([
        *pp_before,
        "decode", f"resize({c.res})", "value_range(-1, 1)",
        f"strfmt({prefix!r}, outkey='prefix')",
        suffix_pp,
        combine_and_keep_train(text_len),
    ])
    return cfg

  c.input = training_data(c.final_split)

  c.evals = {}
  pp_eval = "|".join([
      *pp_before,
      "decode", f"resize({c.res})", "value_range(-1, 1)",
      f"strfmt({prefix!r}, outkey='prefix')",
      *eval_pp_extra,
      combine_and_keep_eval(text_len, keep=eval_keep),
  ])
  for name, split in eval_splits:
    c.evals[f"{prefix_name}/{name}"] = dict(
        type=f"proj.paligemma.transfers.{eval_type}",
        pred="decode", pred_kw={"max_decode_len": text_len},
        log_percent=0.1, tokenizer=TOKENIZER,
        data=dict(name=data_name, split=split), pp_fn=pp_eval,
        **(eval_kw or {}))
  add_eval_pplx(c, dict(training_data(True)), eval_splits, prefix_name)

  mkbase(c, res=c.res, total_epochs=total_epochs, lr=lr, wd=wd)
  if c.mode == "runlocal":
    shrink_for_runlocal(c)
  return c


def caption_task_config(arg, *, data_name, suffix_pp, train_split,
                        final_train_split, eval_splits, captions_pp,
                        prefix="caption en", text_len=32, total_epochs=5,
                        lr=1e-5, wd=0.0, pp_before=(), res_default=224,
                        prefix_name="cap"):
  """One-stop builder for captioning transfers (coco_caption scoring)."""
  c = bvcc.parse_arg(arg, mode="xm", crop="rs", res=res_default,
                     final_split=False)

  def training_data(final_split):
    cfg = bvcc.parse_arg("")
    cfg.data = dict(
        name=data_name,
        split=final_train_split if final_split else train_split)
    cfg.pp = "|".join([
        *pp_before,
        "decode", crop_pp(c.res, c.crop), "value_range(-1, 1)",
        suffix_pp,
        f"strfmt({prefix!r}, outkey='prefix')",
        combine_and_keep_train(text_len),
    ])
    return cfg

  c.input = training_data(c.final_split)

  c.evals = {}
  pp_eval = "|".join([
      *pp_before,
      "decode", f"resize({c.res})", "value_range(-1, 1)",
      f"strfmt({prefix!r}, outkey='prefix')",
      combine_and_keep_eval(text_len, keep=("image/id", "captions")),
  ])
  for name, split in eval_splits:
    c.evals[f"{prefix_name}/{name}"] = dict(
        type="proj.paligemma.transfers.coco_caption",
        # Captioning evals decode with beam search (ref uses beam_size 2-3).
        pred="beam_decode", pred_kw={"max_decode_len": text_len},
        log_percent=0.1, tokenizer=TOKENIZER,
        data=dict(name=data_name, split=split),
        pp_fn="|".join([*captions_pp, pp_eval]))
  add_eval_pplx(c, dict(training_data(True)), eval_splits, prefix_name)

  mkbase(c, res=c.res, total_epochs=total_epochs, lr=lr, wd=wd)
  if c.mode == "runlocal":
    shrink_for_runlocal(c)
  return c


parse_arg = bvcc.parse_arg
arg = bvcc.arg
