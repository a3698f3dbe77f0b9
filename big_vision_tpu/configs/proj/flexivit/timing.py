"""Inference-speed timing sweep over patch sizes (FlexiViT paper fig).

Parity target: reference configs/proj/flexivit/timing.py. Use with
tools/eval_only or a custom timing harness; this config just describes
the model grid.
"""

import ml_collections as mlc

import big_vision_tpu.configs.common as bvcc


def get_config(arg=None):
  c = bvcc.parse_arg(arg, variant="B", res=240, batch_size=8)
  config = mlc.ConfigDict()
  config.batch_size = c.batch_size  # swept
  config.total_steps = 20

  config.model_name = "proj.flexi.vit"
  config.model = dict(variant=c.variant, pool_type="tok",
                      patch_size=(32, 32), posemb_size=(7, 7))
  config.res = c.res
  # The sweep axis: tokens-per-side at fixed image resolution.
  config.seqhw_grid = (5, 6, 8, 10, 12, 15, 20, 24, 30, 40)
  config.evals = {}
  return config
