"""Pre-train ViT on ImageNet-21k (AugReg recipe, arXiv:2106.10270).

Parity target: reference configs/vit_i21k.py. Needs the imagenet21k
dataset (tfds-gated in this image); aug strength follows the AugReg
variant table.
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc
from big_vision_tpu.configs.common_fewshot import get_fewshot_lsr

MIXUP_DEF = {
    "none": dict(p=0.0, fold_in=None),
    "light1": dict(p=0.0, fold_in=None),
    "light2": dict(p=0.2, fold_in=None),
    "medium1": dict(p=0.2, fold_in=None),
    "medium2": dict(p=0.5, fold_in=None),
    "strong1": dict(p=0.5, fold_in=None),
    "strong2": dict(p=0.8, fold_in=None),
}

RANDAUG_DEF = {
    "none": "",
    "light1": "randaug(2,0)",  # Not actually nothing!
    "light2": "randaug(2,10)",
    "medium1": "randaug(2,15)",
    "medium2": "randaug(2,15)",
    "strong1": "randaug(2,20)",
    "strong2": "randaug(2,20)",
}

# Good 30-300ep average per AugReg Fig. 4.
AUG_SETTING = {
    "Ti/16": "none", "S/32": "none", "S/16": "light1",
    "B/32": "light2", "B/16": "light2", "L/16": "medium2",
}


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, variant="B/16", runlocal=False, aug="")
  config = mlc.ConfigDict()

  config.seed = 0
  config.total_epochs = 300
  config.num_classes = 21843
  config.init_head_bias = -10.0
  config.loss = "sigmoid_xent"

  aug = arg.aug or AUG_SETTING[arg.variant]

  config.input = dict()
  config.input.data = dict(name="imagenet21k", split="full[51200:]")
  config.input.batch_size = 4096
  config.input.shuffle_buffer_size = 250_000

  pp_common = ("|value_range(-1, 1)|onehot({onehot_args})"
               "|keep('image', 'labels')")
  pp_i21k = pp_common.format(onehot_args=f"{config.num_classes}")
  randaug = f"|{RANDAUG_DEF[aug]}" if RANDAUG_DEF[aug] else ""
  config.input.pp = (
      f"decode_jpeg_and_inception_crop(224)|flip_lr{randaug}" + pp_i21k)
  pp_eval = "decode|resize_small(256)|central_crop(224)"
  config.pp_modules = ["ops_general", "ops_image", "ops_text",
                       "autoaugment"]

  config.input.prefetch = 8
  config.prefetch_to_device = 4
  config.log_training_steps = 50
  config.ckpt_steps = 1000

  config.model_name = "vit"
  config.model = dict(variant=arg.variant, pool_type="gap",
                      posemb="learn")

  config.optax_name = "scale_by_adam"
  config.optax = dict(mu_dtype="bfloat16")
  config.grad_clip_norm = 1.0
  config.lr = 0.001
  config.wd = 0.0001
  config.schedule = dict(warmup_steps=10_000, decay_type="cosine")
  config.mixup = MIXUP_DEF[aug]

  def eval_i21k(split):
    return dict(
        type="classification",
        data={**config.input.data, "split": split},
        pp_fn=pp_eval + pp_i21k,
        loss_name=config.loss,
        log_steps=1000)

  config.evals = {}
  config.evals.test = eval_i21k("full[:25_600]")
  config.evals.val = eval_i21k("full[25_600:51_200]")
  config.evals.train = eval_i21k("full[51_200:76_800]")
  config.evals.fewshot = get_fewshot_lsr(runlocal=arg.runlocal)
  config.evals.fewshot.log_steps = 25_000

  if arg.runlocal:
    config.input.batch_size = 32
    config.input.shuffle_buffer_size = 100
    del config.evals.test, config.evals.train
  return config
