"""Evaluator-only entry point: init (or load) a model, run config.evals.

Parity target: reference tools/eval_only.py (146 LoC). Useful to score
checkpoints without a training loop:

  python -m big_vision_tpu.tools.eval_only \
      --config big_vision_tpu/configs/load_and_eval.py:name=... --workdir ...
"""

from __future__ import annotations

import importlib

from absl import app, flags
import flax.linen as nn
import jax
import jax.numpy as jnp
from ml_collections import config_flags

import big_vision_tpu.evaluators.common as eval_common
import big_vision_tpu.sharding as bv_sharding
import big_vision_tpu.utils as u

NamedSharding = jax.sharding.NamedSharding
P = jax.sharding.PartitionSpec


def main(argv=None, *, config=None, workdir=None):
  del argv
  if config is None:
    config = flags.FLAGS.config
    workdir = flags.FLAGS.workdir

  for m in config.get("pp_modules",
                      ["ops_general", "ops_image", "ops_text"]):
    importlib.import_module(f"big_vision_tpu.pp.{m}")

  mw = u.MetricWriter(workdir if jax.process_index() == 0 else None)
  mesh = u.create_device_mesh(config.get("mesh", [("data", -1)]))
  devices_flat = mesh.devices.flatten()
  sharding_rules = config.get("sharding_rules", [("act_batch", "data")])
  strategy = config.get("sharding_strategy", [(".*", "replicate")])

  model_mod = importlib.import_module(
      f"big_vision_tpu.models.{config.model_name}")
  model_kw = dict(config.get("model", {}))
  if "num_classes" in config:
    model_kw["num_classes"] = config.num_classes
  model = model_mod.Model(**model_kw)

  def init(rng):
    dummies = [jnp.zeros(s, jnp.float32) if len(s) == 4
               else jnp.zeros(s, jnp.int32) for s in config.init_shapes]
    return model.init(rng, *dummies)["params"]

  rng = jax.random.PRNGKey(config.get("seed", 0))
  with nn.logical_axis_rules(sharding_rules):
    params_shape = jax.eval_shape(init, rng)
    params_sharding = bv_sharding.infer_sharding(params_shape, strategy,
                                                 mesh)
    params = nn.unbox(
        jax.jit(init, out_shardings=params_sharding)(rng))

  if config.get("model_init"):
    u.write_note(f"Loading {config.model_init}...")
    loaded = model_mod.load(jax.device_get(params), config.model_init,
                            model_kw, **config.get("model_load", {}))
    params = u.reshard(loaded, params_sharding)
  train_state = {"params": params}

  def validation_fn(train_state, batch):
    outs = model.apply({"params": train_state["params"]}, batch["image"])
    return outs if isinstance(outs, tuple) else (outs, {})

  def repr_fn(train_state, batch):
    _, out = model.apply({"params": train_state["params"]}, batch["image"])
    return (out["pre_logits"],)

  predict_fns = {"predict": validation_fn, "represent": repr_fn}
  if hasattr(model, "embed_image"):  # two-tower style models
    def contrastive_fn(train_state, batch, **kw):
      zimg, ztxt, out = model.apply(
          {"params": train_state["params"]},
          batch.get("image"), batch.get("labels"), **kw)
      return zimg, ztxt, out
    predict_fns["contrastive"] = contrastive_fn

  evaluators = eval_common.from_config(
      config, predict_fns, write_note=u.write_note,
      get_steps=lambda key, cfg: cfg.get(f"{key}_steps"),
      devices=list(devices_flat))

  for (name, evaluator, _, prefix) in evaluators:
    u.write_note(f"Running {name}...")
    with nn.logical_axis_rules(sharding_rules), mesh:
      for key, value in evaluator.run(train_state):
        mw.measure(f"{prefix}{key}", value)
  mw.step_end()
  mw.close()
  u.sync()


if __name__ == "__main__":
  config_flags.DEFINE_config_file("config", None, "Config.",
                                  lock_config=True)
  flags.DEFINE_string("workdir", default=None, help="Metrics directory.")
  jax.config.parse_flags_with_absl()
  flags.mark_flags_as_required(["config"])
  app.run(main)
