"""Eval-only config: load a checkpoint and run a suite of evaluators.

Parity target: reference configs/load_and_eval.py (the `total_steps=0`
pattern). Use with train.py (runs evals at step 0 and exits) or with
tools/eval_only.py.

  python -m big_vision_tpu.tools.eval_only \
      --config big_vision_tpu/configs/load_and_eval.py:name=vit_i1k,init=i1k-s16-300ep
"""

import importlib


import big_vision_tpu.configs.common as bvcc


def get_config(arg=None):
  arg = bvcc.parse_arg(arg, name="vit_i1k", init="", batch_size=512,
                       lazy=True)
  # Start from the named training config, then strip training.
  base_mod = importlib.import_module(f"big_vision_tpu.configs.{arg.name}")
  config = base_mod.get_config()
  config.total_steps = 0
  if "total_epochs" in config:
    del config.total_epochs  # total_steps=0 must be the only duration.
  config.input.batch_size = arg.batch_size
  if arg.init:
    config.model_init = arg.init
  return config
