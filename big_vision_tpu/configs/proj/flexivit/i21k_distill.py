"""Distill a fixed ViT teacher into FlexiViT on ImageNet-21k.

Parity target: reference configs/proj/flexivit/i21k_distill.py.
Run with: big_vision_tpu.trainers.proj.flexi.distill
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc


def get_config(arg=None):
  c = bvcc.parse_arg(arg, runlocal=False, res=240)
  c = mlc.ConfigDict(dict(arg=c))
  arg = c.arg

  c.seed = 0
  c.total_epochs = 90
  c.num_classes = 21843
  c.loss = "softmax_xent"

  c.input = dict()
  c.input.data = dict(name="imagenet21k", split="full[51200:]")
  c.input.batch_size = 4096 if not arg.runlocal else 8
  c.input.shuffle_buffer_size = 250_000 if not arg.runlocal else 25
  c.input.pp = (
      f"decode_jpeg_and_inception_crop({arg.res})|flip_lr"
      f"|value_range(-1, 1)|onehot({c.num_classes})"
      "|keep('image', 'labels')")
  c.init_shapes = [(1, arg.res, arg.res, 3)]

  c.student_name = "proj.flexi.vit"
  c.student = dict(variant="B", pool_type="tok", patch_size=(32, 32),
                   posemb_size=(7, 7))
  c.student_init = ""

  c.teachers = ["prof"]
  c.prof_name = "vit"
  c.prof = dict(variant="B/8", pool_type="tok")
  c.prof_init = "howto-i21k-B/8"

  c.distance = "kl"
  c.distance_kw = dict(t=1.0)

  c.flexi = mlc.ConfigDict()
  c.flexi.seqhw = mlc.ConfigDict(dict(
      v=(5, 6, 8, 10, 12, 15, 20, 24, 30, 40),
      p=(1, 1, 1, 1, 1, 34, 1, 1, 1, 1)))

  c.optax_name = "scale_by_adam"
  c.optax = dict(mu_dtype="bfloat16")
  c.grad_clip_norm = 1.0
  c.lr = 0.001
  c.wd = 0.0001
  c.schedule = dict(warmup_steps=5_000, decay_type="cosine")

  c.log_training_steps = 50
  c.ckpt_steps = 1000
  c.evals = {}
  return c
