"""Jet flow smoke config (tiny; synthetic images)."""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, res=16, total_steps=15, batch_size=16)
  config = mlc.ConfigDict()
  config.seed = 0
  config.total_steps = arg.total_steps
  config.init_shapes = [(1, arg.res, arg.res, 3)]

  config.input = dict(
      data=dict(name="synthetic", n=64, num_classes=8, h=24, w=24),
      batch_size=arg.batch_size,
      shuffle_buffer_size=32, num_threads=4, prefetch=1,
      pp=(f"decode|resize({arg.res})|value_range(0, 1)"
          "|keep('image')"),
  )
  config.log_training_steps = 5
  config.ckpt_steps = 10

  config.model_name = "proj.jet.jet"
  config.model = dict(depth=4, block_depth=1, emb_dim=32, num_heads=2,
                      ps=4)

  config.optax_name = "scale_by_adam"
  config.lr = 1e-3
  config.wd = 0.0
  config.schedule = dict(warmup_steps=2, decay_type="cosine")
  config.evals = {}
  return config
