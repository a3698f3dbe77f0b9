"""ViT-B on ImageNet-1k with GSAM and no heavy augmentation.

Parity target: reference configs/proj/gsam/vit_i1k_gsam_no_aug.py
(arXiv:2203.08065). Run with big_vision_tpu.trainers.proj.gsam.gsam.
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc
from big_vision_tpu.configs.common_fewshot import get_fewshot_lsr


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, variant="B/32", runlocal=False)
  config = mlc.ConfigDict()
  config.seed = 0

  config.loss = "sigmoid_xent"
  config.num_classes = 1000
  config.total_epochs = 300

  pp_common = ("|value_range(-1, 1)"
               "|onehot(1000, key='label', key_result='labels')"
               "|keep('image', 'labels')")
  config.input = dict(
      data=dict(name="imagenet2012", split="train[:99%]"),
      batch_size=4096 if not arg.runlocal else 16,
      shuffle_buffer_size=250_000 if not arg.runlocal else 50,
      # GSAM paper: NO heavy augmentation, just inception crop + flip.
      pp=("decode_jpeg_and_inception_crop(224)|flip_lr" + pp_common),
  )
  pp_eval = "decode|resize_small(256)|central_crop(224)" + pp_common
  config.init_shapes = [(1, 224, 224, 3)]

  config.log_training_steps = 50
  config.ckpt_steps = 1000

  config.model_name = "vit"
  config.model = dict(variant=arg.variant, rep_size=True,
                      pool_type="tok")

  config.optax_name = "scale_by_adam"
  config.optax = dict(mu_dtype="bfloat16")
  config.grad_clip_norm = 1.0
  config.lr = 0.003
  config.wd = 0.001  # Effective wd = wd * lr.
  config.schedule = dict(warmup_steps=10_000, decay_type="linear",
                         linear_end=0.00003)

  # rho_max=rho_min and alpha=0 reduces GSAM to SAM.
  config.gsam = dict(rho_max=0.6, rho_min=0.1, alpha=0.6,
                     lr_max=config.get_ref("lr"),
                     lr_min=config.schedule.get_ref("linear_end")
                     * config.get_ref("lr"))

  config.evals = {}
  config.evals.val = dict(
      type="classification",
      data=dict(name="imagenet2012", split="train[99%:]"),
      pp_fn=pp_eval, loss_name=config.loss, log_steps=2500)
  config.evals.test = dict(
      type="classification",
      data=dict(name="imagenet2012", split="validation"),
      pp_fn=pp_eval, loss_name=config.loss, log_steps=2500)
  config.evals.fewshot = get_fewshot_lsr(runlocal=arg.runlocal)
  return config
