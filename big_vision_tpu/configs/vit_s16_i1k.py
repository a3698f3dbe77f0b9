"""ViT-S/16 on ImageNet-1k: the 76.5%-in-90-epochs baseline.

Parity target: reference big_vision/configs/vit_s16_i1k.py (expected 76.5%
top-1 after 90ep, ~6-7h on a TPU v3-8; see BASELINE.md).

  python -m big_vision_tpu.train \
      --config big_vision_tpu/configs/vit_s16_i1k.py --workdir $WD

Notes vs the reference recipe: identical model/optimizer/pp semantics; data
comes through the TPU-native pipeline (set `data_dir` for a TFDS-prepared
imagenet2012, or data.name='imagefolder' with root=... for a raw tree).
`:runlocal` shrinks everything for a laptop smoke run.
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, variant="S/16", runlocal=False, total_epochs=90,
                       randaug="2-10")
  config = mlc.ConfigDict()

  config.seed = 0
  config.total_epochs = arg.total_epochs
  config.num_classes = 1000
  config.loss = "softmax_xent"
  config.init_shapes = [(1, 224, 224, 3)]

  config.input = dict(
      data=dict(name="imagenet2012", split="train[:99%]"),
      batch_size=1024 if not arg.runlocal else 32,
      shuffle_buffer_size=250_000 if not arg.runlocal else 64,
      prefetch=2,
  )

  pp_common = (
      "|value_range(-1, 1)"
      "|onehot(1000, key='{lbl}', key_result='labels')"
      "|keep('image', 'labels')"
  )
  ra = ""
  if arg.randaug:
    layers, magnitude = map(int, arg.randaug.split("-"))
    ra = f"|randaug({layers}, {magnitude})"
  config.input.pp = (
      f"decode_jpeg_and_inception_crop(224)|flip_lr{ra}"
      + pp_common.format(lbl="label"))
  pp_eval = "decode|resize_small(256)|central_crop(224)" + pp_common

  config.log_training_steps = 50
  config.ckpt_steps = 1000

  config.model_name = "vit"
  config.model = dict(
      variant=arg.variant,
      rep_size=True,
      pool_type="gap",
      posemb="sincos2d",
  )

  config.grad_clip_norm = 1.0
  config.optax_name = "scale_by_adam"
  config.optax = dict(mu_dtype="bfloat16")
  config.lr = 0.001
  config.wd = 0.0001
  config.schedule = dict(warmup_steps=10_000, decay_type="cosine")
  config.mixup = dict(p=0.2)

  def get_eval(split, dataset="imagenet2012", lbl="label"):
    return dict(
        type="classification",
        data=dict(name=dataset, split=split),
        pp_fn=pp_eval.format(lbl=lbl),
        loss_name=config.loss,
        log_steps=2500,
    )
  config.evals = dict(
      train=get_eval("train[:2%]"),
      minival=get_eval("train[99%:]"),
      val=get_eval("validation"),
      v2=get_eval("test", dataset="imagenet_v2"),
      real=get_eval("validation", dataset="imagenet2012_real", lbl="real_label"),
  )
  if arg.runlocal:
    config.evals = dict(val=config.evals.val)
  return config
