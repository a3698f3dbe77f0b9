"""Distill DeiT-III into FlexiViT on ImageNet-1k.

Parity target: reference configs/proj/flexivit/i1k_deit3_distill.py.
Run with: big_vision_tpu.trainers.proj.flexi.distill
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc


def get_config(arg=None):
  c = bvcc.parse_arg(arg, runlocal=False, res=240, variant="B")
  c = mlc.ConfigDict(dict(arg=c))
  arg = c.arg

  c.seed = 0
  c.total_epochs = 90
  c.num_classes = 1000
  c.loss = "softmax_xent"

  c.input = dict()
  c.input.data = dict(name="imagenet2012", split="train[:99%]")
  c.input.batch_size = 1024 if not arg.runlocal else 8
  c.input.shuffle_buffer_size = 250_000 if not arg.runlocal else 25
  c.input.pp = (
      f"decode_jpeg_and_inception_crop({arg.res})|flip_lr"
      f"|value_range(-1, 1)|onehot({c.num_classes})"
      "|keep('image', 'labels')")
  c.init_shapes = [(1, arg.res, arg.res, 3)]

  c.variant = arg.variant
  c.student_name = "proj.flexi.vit"
  c.student_init = f"deit3_{arg.variant}_384_1k"
  c.student = dict(variant=arg.variant, pool_type="tok",
                   patch_size=(16, 16), posemb_size=(7, 7))

  c.teachers = ["prof"]
  c.prof_name = "vit"
  c.prof = dict(variant=f"{arg.variant}/16", pool_type="tok")
  c.prof_init = f"deit3_{arg.variant}_384_1k"

  c.distance = "kl"
  c.distance_kw = dict(t=1.0)

  c.flexi = mlc.ConfigDict()
  c.flexi.seqhw = mlc.ConfigDict(dict(
      v=(5, 6, 8, 10, 12, 15, 20, 24, 30, 40),
      p=(1, 1, 1, 1, 1, 34, 1, 1, 1, 1)))

  c.optax_name = "scale_by_adam"
  c.optax = dict(mu_dtype="bfloat16")
  c.grad_clip_norm = 1.0
  c.lr = 1e-4
  c.wd = 1e-5
  c.schedule = dict(warmup_steps=5_000, decay_type="cosine")

  c.log_training_steps = 50
  c.ckpt_steps = 1000
  c.evals = {}
  minival = "train[99%:]"
  for s in (5, 10, 15, 30):
    c.evals[f"minival_{s:02d}"] = dict(
        type="classification", pred=f"student_seqhw={s}",
        data=dict(name="imagenet2012", split=minival),
        pp_fn=("decode|resize_small(274)|central_crop(240)"
               f"|value_range(-1, 1)|onehot({c.num_classes})"
               "|keep('image', 'labels')"),
        loss_name=c.loss, log_steps=5000)
  return c
