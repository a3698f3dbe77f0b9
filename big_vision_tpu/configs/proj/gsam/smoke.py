"""GSAM smoke config (tiny ViT, synthetic data)."""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, res=32, total_steps=10, batch_size=16)
  config = mlc.ConfigDict()
  config.seed = 0
  config.total_steps = arg.total_steps
  config.num_classes = 10
  config.loss = "softmax_xent"
  config.init_shapes = [(1, arg.res, arg.res, 3)]

  config.input = dict(
      data=dict(name="synthetic", n=64, num_classes=10, h=40, w=40),
      batch_size=arg.batch_size,
      shuffle_buffer_size=32, num_threads=4, prefetch=1,
      pp=(f"decode_jpeg_and_inception_crop({arg.res})|flip_lr"
          "|value_range(-1, 1)"
          "|onehot(10, key='label', key_result='labels')"
          "|keep('image', 'labels')"),
  )
  config.log_training_steps = 5
  config.ckpt_steps = 10

  config.model_name = "vit"
  config.model = dict(variant="mu/16", posemb="sincos2d",
                      head_zeroinit=False)

  config.gsam = dict(rho_max=0.6, rho_min=0.1, alpha=0.6,
                     lr_min_ratio=0.0, adaptive_perturbation=False,
                     minimize_fp=True)

  config.optax_name = "scale_by_adam"
  config.lr = 1e-3
  config.wd = 1e-4
  config.schedule = dict(warmup_steps=2, decay_type="cosine")
  config.evals = {}
  return config
