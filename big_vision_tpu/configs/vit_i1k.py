"""AugReg ViT on ImageNet-1k ("how to train your ViT" recipes).

Parity target: reference configs/vit_i1k.py (aug-strength table Fig4 of
arxiv.org/abs/2106.10270; sigmoid loss, head bias -6.9, 300 epochs).

  python -m big_vision_tpu.train \
      --config big_vision_tpu/configs/vit_i1k.py:variant=B/16 --workdir $WD
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc

MIXUP_DEF = {
    "none": dict(p=0.0),
    "light1": dict(p=0.0),
    "light2": dict(p=0.2),
    "medium1": dict(p=0.2),
    "medium2": dict(p=0.5),
    "strong1": dict(p=0.5),
    "strong2": dict(p=0.8),
}

RANDAUG_DEF = {
    "none": "",
    "light1": "randaug(2,0)|",
    "light2": "randaug(2,10)|",
    "medium1": "randaug(2,15)|",
    "medium2": "randaug(2,15)|",
    "strong1": "randaug(2,20)|",
    "strong2": "randaug(2,20)|",
}


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, variant="B/16", runlocal=False, aug="")
  config = mlc.ConfigDict()

  config.seed = 0
  config.total_epochs = 300
  config.num_classes = 1000
  config.loss = "sigmoid_xent"
  config.init_head_bias = -6.9
  config.init_shapes = [(1, 224, 224, 3)]

  aug_setting = arg.aug or {
      "Ti/16": "light1", "S/32": "medium1", "S/16": "medium2",
      "B/32": "medium2", "B/16": "medium2", "L/16": "medium2",
  }[arg.variant]

  config.input = dict(
      data=dict(name="imagenet2012", split="train[:99%]"),
      batch_size=4096 if not arg.runlocal else 32,
      shuffle_buffer_size=250_000 if not arg.runlocal else 64,
      prefetch=8,
  )
  pp_common = ("|value_range(-1, 1)"
               "|onehot(1000, key='{lbl}', key_result='labels')"
               "|keep('image', 'labels')")
  config.input.pp = (
      "decode_jpeg_and_inception_crop(224)|flip_lr|"
      + RANDAUG_DEF[aug_setting] + pp_common.format(lbl="label").lstrip("|"))
  pp_eval = "decode|resize_small(256)|central_crop(224)" + pp_common

  config.log_training_steps = 50
  config.ckpt_steps = 1000

  config.model_name = "vit"
  config.model = dict(variant=arg.variant, rep_size=False,
                      pool_type="gap", posemb="sincos2d")

  config.mixup = MIXUP_DEF[aug_setting]

  config.grad_clip_norm = 1.0
  config.optax_name = "scale_by_adam"
  config.optax = dict(mu_dtype="bfloat16")
  config.lr = 0.001
  config.wd = 0.0001
  config.schedule = dict(warmup_steps=10_000, decay_type="cosine")

  def get_eval(split, dataset="imagenet2012", lbl="label"):
    return dict(type="classification",
                data=dict(name=dataset, split=split),
                pp_fn=pp_eval.format(lbl=lbl),
                loss_name=config.loss, log_steps=2500)
  config.evals = dict(
      train=get_eval("train[:2%]"),
      minival=get_eval("train[99%:]"),
      val=get_eval("validation"),
      v2=get_eval("test", dataset="imagenet_v2"),
  )
  if arg.runlocal:
    config.evals = dict(val=config.evals.val)
  return config
