"""Jet normalizing flow on downsampled ImageNet 64x64.

Parity target: reference configs/proj/jet/imagenet64.py
(arXiv:2412.15129). Metric: bits/dim.
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, runlocal=False)
  config = mlc.ConfigDict()
  config.seed = 0
  config.total_epochs = 200

  config.input = dict(
      data=dict(name="downsampled_imagenet/64x64", split="train"),
      batch_size=1024 if not arg.runlocal else 32,
      shuffle_buffer_size=250_000 if not arg.runlocal else 50,
      pp="decode|resize(64)|value_range(0, 1)|keep('image')",
  )
  config.init_shapes = [(1, 64, 64, 3)]
  config.log_training_steps = 50
  config.ckpt_steps = 1000

  config.model_name = "proj.jet.jet"
  config.model = dict(
      depth=32, block_depth=2, emb_dim=512, num_heads=8, ps=4,
      kinds=("channels", "channels", "spatial"),
      channels_coupling_projs=("random",),
      spatial_coupling_projs=("checkerboard", "checkerboard-inv",
                              "vstripes", "vstripes-inv",
                              "hstripes", "hstripes-inv"))

  config.optax_name = "scale_by_adam"
  config.optax = dict(b2=0.95)
  config.lr = 3e-4
  config.wd = 1e-5
  config.schedule = [
      (".*FREEZE_ME.*", None),
      (".*", dict(decay_type="cosine", warmup_percent=0.1)),
  ]
  config.grad_clip_norm = 1.0

  config.evals = {}
  config.evals.val = dict(
      type="mean", pred="bits_per_dim",
      data=dict(name="downsampled_imagenet/64x64",
                split="validation"),
      pp_fn=config.input["pp"], log_steps=1000)
  return config
