"""UViM stage-II trainer: LM over stage-I VQ codes given the image.

Parity target: reference trainers/proj/uvim/train.py: a frozen stage-I
"oracle" encodes the task output into discrete codes; the VTT model learns
p(codes | image) with CE. At inference, decode.py samples codes that the
stage-I decoder renders back into the task output.

Config: config.oracle = dict(model=..., model_init=..., init_inputs=...)
mirrors the stage-I setup. Code targets are shifted by +1 so 0 stays the
BOS/pad token of the VTT vocabulary.
"""

from __future__ import annotations

import functools
import importlib
import os

from absl import app, flags
import flax.linen as nn
import jax
import jax.numpy as jnp
from ml_collections import config_flags
import numpy as np
import optax

import big_vision_tpu.evaluators.common as eval_common
import big_vision_tpu.input_pipeline as input_pipeline
import big_vision_tpu.optim as bv_optim
import big_vision_tpu.sharding as bv_sharding
import big_vision_tpu.utils as u

NamedSharding = jax.sharding.NamedSharding
P = jax.sharding.PartitionSpec


def main(argv=None, *, config=None, workdir=None):
  prev_guard = getattr(jax.config, "jax_transfer_guard", None) or "allow"
  try:
    return _main(argv, config=config, workdir=workdir)
  finally:
    jax.config.update("jax_transfer_guard", prev_guard)


def _main(argv=None, *, config=None, workdir=None):
  del argv
  if config is None:
    config = flags.FLAGS.config
    workdir = flags.FLAGS.workdir
  if os.environ.get("BV_JAX_INIT"):
    jax.distributed.initialize()
  jax.config.update("jax_transfer_guard", "disallow")

  for m in config.get("pp_modules", ["ops_general", "ops_image", "proj.uvim.pp_ops"]):
    importlib.import_module(f"big_vision_tpu.pp.{m}")

  mw = u.MetricWriter(workdir if jax.process_index() == 0 else None,
                      echo=config.get("log_training_verbose", True))
  chrono = u.chrono
  chrono.inform(measure=mw.measure, write_note=u.write_note)
  with jax.transfer_guard("allow"):
    rng = jax.random.PRNGKey(config.get("seed", 0))

  mesh = u.create_device_mesh(config.get("mesh", [("data", -1)]))
  devices_flat = mesh.devices.flatten()
  repl_sharding = NamedSharding(mesh, P())
  sharding_rules = config.get("sharding_rules", [("act_batch", "data")])
  strategy = config.get("sharding_strategy", [(".*", "replicate")])

  batch_size = config.input.batch_size
  # Iterator built AFTER the resume ladder so a resumed run can seek the
  # raw stream to its exact sample position (sample-exact resume).
  ntrain_img = input_pipeline.total_training_examples(config.input)

  total_steps = u.steps("total", config, ntrain_img, batch_size)
  def get_steps(name, default=ValueError, cfg=config):
    return u.steps(name, cfg, ntrain_img, batch_size, total_steps, default)
  chrono.inform(first_step=0, total_steps=total_steps, global_bs=batch_size,
                steps_per_epoch=ntrain_img / batch_size)

  # Frozen stage-I oracle.
  oracle_cfg = dict(config.oracle)
  oracle_mod = importlib.import_module(
      f"big_vision_tpu.models.{oracle_cfg.get('model_name', 'proj.uvim.vit')}")
  oracle = oracle_mod.Model(**oracle_cfg["model"])
  oracle_keys = list(dict(oracle_cfg["model"])["inputs"].keys())

  # Optional task adapter (same contract as the stage-I trainer).
  task = None
  if config.get("task"):
    task = importlib.import_module(
        f"big_vision_tpu.trainers.proj.uvim.{config.task}_task")

  class _OracleCfgView:
    """Task adapters read cfg.model.* / cfg.min_depth; map to oracle."""
    def __init__(self):
      self.model = config.oracle.model
      self.min_depth = config.get("min_depth", 0.001)
      self.max_depth = config.get("max_depth", 10.0)
  task_cfg = _OracleCfgView()

  def oracle_inputs_ctx(batch):
    if task is not None:
      t = task.input_pp(batch, task_cfg)
      ctx = t["ctx"] if oracle_cfg.get("with_ctx", True) else None
      return t["x"], ctx
    inputs = {k: batch[k] for k in oracle_keys}
    ctx = batch.get("image") if oracle_cfg.get("with_ctx") else None
    return inputs, ctx

  def oracle_init(rng):
    rngs = {"params": rng, "state": jax.random.fold_in(rng, 1),
            "vqvae": jax.random.fold_in(rng, 2)}
    if task is not None:
      om = dict(config.oracle.model)
      hp, wp = om["patch_size"]
      npatch = int(np.prod(np.array(om["input_size"])
                           // np.array((hp, wp))))
      dummy = {k: jnp.zeros((1, npatch, *shape), jnp.float32)
               for k, shape in dict(om["inputs"]).items()}
      ctx = jnp.zeros((1, *om["input_size"], 3), jnp.float32)
    else:
      dummy = {k: jnp.zeros(s, jnp.float32)
               for k, s in oracle_cfg["init_inputs"].items()}
      ctx = (jnp.zeros(oracle_cfg["init_ctx"], jnp.float32)
             if oracle_cfg.get("init_ctx") else None)
    variables = oracle.init(rngs, dummy, ctx=ctx)
    return variables["params"], variables["state"]

  with jax.transfer_guard("allow"):
    o_params, o_state = jax.jit(oracle_init)(jax.random.PRNGKey(17))
    if oracle_cfg.get("model_init"):
      o_params, o_state = oracle_mod.load(
          jax.device_get(o_params), oracle_cfg["model_init"])
      o_params = u.reshard(o_params, jax.tree.map(
          lambda _: repl_sharding, o_params))
      o_state = u.reshard(o_state, jax.tree.map(
          lambda _: repl_sharding, o_state))

  # Stage-II model.
  model_mod = importlib.import_module(
      f"big_vision_tpu.models.{config.get('model_name', 'proj.uvim.vtt')}")
  model = model_mod.Model(**config.get("model", {}))

  def init(rng):
    img_shape, code_shape = config.init_shapes
    img = jnp.zeros(img_shape, jnp.float32)
    codes = jnp.zeros(code_shape, jnp.int32)
    return model.init(rng, img, codes)["params"]

  rng, rng_init = jax.random.split(rng)
  with nn.logical_axis_rules(sharding_rules):
    params_shape = jax.eval_shape(init, rng_init)
  tx, sched_fns = bv_optim.make(
      config, nn.unbox(params_shape),
      sched_kw=dict(total_steps=total_steps, batch_size=batch_size,
                    data_size=ntrain_img))
  with nn.logical_axis_rules(sharding_rules):
    params_sharding = bv_sharding.infer_sharding(params_shape, strategy,
                                                 mesh)
  from big_vision_tpu.train import infer_opt_sharding
  opt_sharding = infer_opt_sharding(tx, nn.unbox(params_shape),
                                    params_sharding, repl_sharding)
  train_state_sharding = {"params": params_sharding, "opt": opt_sharding}

  with jax.transfer_guard("allow"):
    rng_init = u.reshard(rng_init, repl_sharding)
  params = nn.unbox(
      jax.jit(init, out_shardings=params_sharding)(rng_init))
  opt = jax.jit(tx.init, out_shardings=opt_sharding)(params)
  train_state = {"params": params, "opt": opt}
  del params, opt

  rng, rng_loop = jax.random.split(rng)
  with jax.transfer_guard("allow"):
    rng_loop = u.reshard(rng_loop, repl_sharding)

  def get_codes(batch):
    """Oracle encodes task outputs into discrete codes (+1: 0 is BOS)."""
    inputs, ctx = oracle_inputs_ctx(batch)
    _, out = oracle.apply({"params": o_params, "state": o_state},
                          inputs, ctx=ctx, method=oracle.encode,
                          update_dict=False)
    return out["code"] + 1

  @functools.partial(
      jax.jit, donate_argnums=(0,),
      out_shardings=(train_state_sharding, repl_sharding))
  def update_fn(train_state, rng, batch):
    step_rng = jax.random.fold_in(
        rng, bv_optim.get_count(train_state["opt"], jittable=True))
    codes = get_codes(batch)

    def loss_fn(params):
      logits = model.apply({"params": params}, batch["image"], codes,
                           train=True, rngs={"dropout": step_rng})
      return u.weighted_softmax_xent(
          logits=logits, labels=codes,
          weights=jnp.ones_like(codes, jnp.float32),
          reduction=True, normalize=True)

    params, opt = train_state["params"], train_state["opt"]
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt = tx.update(grads, opt, params)
    params = optax.apply_updates(params, updates)
    return {"params": params, "opt": opt}, {
        "training_loss": loss, "l2_grads": optax.global_norm(grads)}

  first_step = 0
  ckpt_steps = get_steps("ckpt", default=None)
  ckpt_mgr = (u.CheckpointManager(timeout=config.get("ckpt_timeout"))
              if (workdir and ckpt_steps) else None)
  ckpt_prefix = os.path.join(workdir, "ckpt.bv") if workdir else None
  # Resume ladder: workdir ckpt-LAST > config.resume > model_init >
  # scratch (ref train.py:323-335).
  last = u.last_checkpoint_dir(ckpt_prefix) if ckpt_prefix else None
  last = last or config.get("resume")
  if last:
    with jax.transfer_guard("allow"):
      abstract = jax.tree.map(
          lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
          train_state, train_state_sharding)
      loaded = u.load_checkpoint(
          {**abstract, "chrono": jax.ShapeDtypeStruct((4,), np.float64)},
          last)
      chrono.load(loaded.pop("chrono"))
      train_state = loaded
      first_step = bv_optim.get_count(train_state["opt"])
    chrono.inform(first_step=first_step)
  elif config.get("model_init"):
    with jax.transfer_guard("allow"):
      loaded = model_mod.load(
          jax.device_get(train_state["params"]), config.model_init,
          config.get("model", {}), **config.get("model_load", {}))
      train_state["params"] = u.reshard(loaded, params_sharding)

  def perplexity_fn(train_state, batch):
    codes = get_codes(batch)
    logits = model.apply({"params": train_state["params"]},
                         batch["image"], codes)
    nll = u.weighted_softmax_xent(
        logits=logits, labels=codes,
        weights=jnp.ones_like(codes, jnp.float32),
        reduction=False, normalize=True)
    return {"perplexity": nll}

  def validation_fn(train_state, batch):
    return {"loss": perplexity_fn(train_state, batch)["perplexity"]}

  predict_fns = {"perplexity": perplexity_fn,
                 "validation": validation_fn}

  if task is not None:
    from big_vision_tpu.models.proj.uvim import decode as uvim_decode

    def task_output_fn(train_state, batch, *, temperature=None, **kw):
      """Sample codes AR, oracle-decode them, render the task output."""
      code_len = config.model["seq_len"]
      bs = batch["image"].shape[0]
      prompts = jnp.zeros((bs, code_len), jnp.int32)
      t = (temperature if temperature is not None
           else config.get("sample_temperature", 0.0))
      kw_t = dict(temperature=t) if t > 0 else {}
      sample = (uvim_decode.temperature_sampling if t > 0
                else uvim_decode.argmax_sampling)
      seqs, _, _ = sample(
          {"params": train_state["params"]}, batch["image"], prompts,
          jax.random.PRNGKey(0), model=model, num_samples=1,
          eos_token=-1, **kw_t)
      codes = jnp.clip(seqs[:, -1] - 1, 0, None)  # Best sample; undo +1.
      ctx = batch.get("image") if oracle_cfg.get("with_ctx", True) \
          else None
      logits, _ = oracle.apply({"params": o_params, "state": o_state},
                               codes, ctx=ctx, discrete_input=True,
                               method=oracle.decode)
      out = task.predict_outputs(logits, task_cfg, **kw)
      if config.task == "panoptic":
        return {"semantics": out[..., 0], "instances": out[..., 1]}
      return out

    predict_fns[{"panoptic": "panoptic", "depth": "depth",
                 "colorization": "color"}[config.task]] = task_output_fn

  @functools.cache
  def evaluators():
    return eval_common.from_config(
        config, predict_fns, write_note=u.write_note,
        get_steps=lambda key, cfg: u.steps(
            key, cfg, ntrain_img, batch_size, total_steps, default=None),
        devices=list(devices_flat))

  last_eval = {}

  def run_evals(step, final=False, initial=False):
    for (name, evaluator, log_steps, prefix) in evaluators():
      if initial and config.evals[name].get("skip_first"):
        continue
      due = final or (log_steps and step % log_steps == 0)
      if due and last_eval.get(name) != step:
        last_eval[name] = step
        chrono.pause(wait_for=jax.tree.leaves(train_state["params"]))
        with nn.logical_axis_rules(sharding_rules), \
             jax.transfer_guard("allow"), mesh:
          for key, value in evaluator.run(train_state):
            mw.measure(f"{prefix}{key}", value)
        chrono.resume()

  log_steps = get_steps("log_training", default=50)
  u.write_note("Starting UViM stage-II training loop...")
  if first_step in (total_steps, 0):
    # Initial-or-final evals (ref trainers, e.g. ref paligemma/train.py
    # :410-418): a fresh run evals at step 0 minus `skip_first`
    # evaluators; a fully-trained resume runs the final evals it may
    # have been preempted out of.
    mw.step_start(first_step)
    run_evals(first_step, final=True, initial=first_step != total_steps)
    mw.step_end()
  step = first_step
  train_iter = input_pipeline.training_from_step(
      config.input, first_step, devices=devices_flat,
      seed=config.get("seed", 0))

  for step in range(first_step + 1, total_steps + 1):
    mw.step_start(step)
    batch = next(train_iter)
    batch = {k: v for k, v in batch.items() if isinstance(v, jax.Array)}
    with nn.logical_axis_rules(sharding_rules), mesh:
      train_state, measurements = update_fn(train_state, rng_loop, batch)

    if (log_steps and step % log_steps == 0) or step == total_steps:
      with jax.transfer_guard("allow"):
        for name, value in measurements.items():
          v = mw.measure(name, value)
          if name == "training_loss" and not np.isfinite(v):
            raise RuntimeError(f"Loss became {v} at step {step}")
        chrono.tick(step)

    if (ckpt_mgr and ckpt_steps
        and (step % ckpt_steps == 0 or step == total_steps)):
      chrono.pause(wait_for=jax.tree.leaves(train_state))
      with jax.transfer_guard("allow"):
        ckpt_mgr.save({**train_state, "chrono": u.put_cpu(chrono.save())},
                      ckpt_prefix, step)
      chrono.resume()

    run_evals(step)
    mw.step_end()

  if total_steps > 0:
    run_evals(step, final=True)
  if ckpt_mgr:
    ckpt_mgr.close()
  mw.close()
  u.sync()
  return train_state


if __name__ == "__main__":
  config_flags.DEFINE_config_file("config", None, "Config.",
                                  lock_config=True)
  flags.DEFINE_string("workdir", default=None, help="Work unit directory.")
  jax.config.parse_flags_with_absl()
  flags.mark_flags_as_required(["config"])
  app.run(lambda argv: (main(argv), None)[-1])
