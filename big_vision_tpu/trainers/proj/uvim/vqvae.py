"""UViM stage-I trainer: VQ-VAE over task outputs.

Parity target: reference trainers/proj/uvim/vqvae.py: reconstruction loss
on the quantized bottleneck + commitment-style codebook EMA updates (the
codebook lives in train_state["state"], not in params). Task-specific
losses come from config.task_loss: "xent" (categorical one-hot outputs,
e.g. panoptic) or "l2" (regression, e.g. depth/color).
"""

from __future__ import annotations

import functools
import importlib
import os

from absl import app, flags
import flax
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


def task_loss_fn(kind, logits, targets):
  """Per-output reconstruction loss."""
  if kind == "xent":
    return u.softmax_xent(logits=logits, labels=targets, reduction=True)
  if kind == "l2":
    return jnp.mean(jnp.square(logits - targets))
  raise ValueError(f"Unknown task loss {kind!r}")


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

  model_mod = importlib.import_module(
      f"big_vision_tpu.models.{config.get('model_name', 'proj.uvim.vit')}")
  model = model_mod.Model(**config.get("model", {}))
  input_keys = list(dict(config.model)["inputs"].keys())
  task_losses = dict(config.get(
      "task_losses", {k: "xent" for k in input_keys}))

  # Optional task adapter (panoptic/depth/colorization): batches then carry
  # the raw map under "labels" and the adapter builds the per-patch one-hot
  # model inputs + losses + output predictions (ref uvim/train.py:65).
  task = None
  if config.get("task"):
    task = importlib.import_module(
        f"big_vision_tpu.trainers.proj.uvim.{config.task}_task")

  def batch_to_inputs(batch):
    if task is not None:
      t = task.input_pp(batch, config)
      ctx = t["ctx"] if config.get("with_ctx") else None
      return t["x"], ctx
    inputs = {k: batch[k] for k in input_keys}
    ctx = batch.get("image") if config.get("with_ctx") else None
    return inputs, ctx

  def init(rng):
    rngs = {"params": rng, "state": jax.random.fold_in(rng, 1),
            "vqvae": jax.random.fold_in(rng, 2),
            "dropout": jax.random.fold_in(rng, 3)}
    if task is not None:
      hp, wp = config.model.patch_size
      npatch = int(np.prod(np.array(config.model.input_size)
                           // np.array((hp, wp))))
      dummy = {k: jnp.zeros((1, npatch, *shape), jnp.float32)
               for k, shape in dict(config.model)["inputs"].items()}
      ctx = (jnp.zeros((1, *config.model.input_size, 3), jnp.float32)
             if config.get("with_ctx") else None)
    else:
      dummy = {k: jnp.zeros(shape, jnp.float32)
               for k, shape in config.init_inputs.items()}
      ctx = (jnp.zeros(config.init_ctx, jnp.float32)
             if config.get("init_ctx") else None)
    variables = model.init(rngs, dummy, ctx=ctx)
    params, state = variables["params"], variables["state"]
    # Heads start at a configurable bias so the initial loss is small
    # (ref vqvae.py:157-160).
    if config.get("init_head_bias") is not None:
      params = flax.core.unfreeze(params)
      for key in dict(config.model)["outputs"]:
        params[f"head_{key}"]["bias"] = jnp.full_like(
            params[f"head_{key}"]["bias"], config.init_head_bias)
    return params, state

  rng, rng_init = jax.random.split(rng)
  with nn.logical_axis_rules(sharding_rules):
    params_shape, state_shape = jax.eval_shape(init, rng_init)
  tx, sched_fns = bv_optim.make(
      config, nn.unbox(params_shape),
      sched_kw=dict(total_steps=total_steps, batch_size=batch_size,
                    data_size=ntrain_img))
  with nn.logical_axis_rules(sharding_rules):
    params_sharding = bv_sharding.infer_sharding(params_shape, strategy,
                                                 mesh)
  state_sharding = jax.tree.map(lambda _: repl_sharding, state_shape)
  from big_vision_tpu.train import infer_opt_sharding
  opt_sharding = infer_opt_sharding(tx, nn.unbox(params_shape),
                                    params_sharding, repl_sharding)
  train_state_sharding = {"params": params_sharding, "opt": opt_sharding,
                          "state": state_sharding}

  with jax.transfer_guard("allow"):
    rng_init = u.reshard(rng_init, repl_sharding)
  params, state = jax.jit(
      init, out_shardings=(params_sharding, state_sharding))(rng_init)
  opt = jax.jit(tx.init, out_shardings=opt_sharding)(nn.unbox(params))
  train_state = {"params": nn.unbox(params), "opt": opt, "state": state}
  del params, state, opt

  rng, rng_loop = jax.random.split(rng)
  with jax.transfer_guard("allow"):
    rng_loop = u.reshard(rng_loop, repl_sharding)

  @functools.partial(
      jax.jit, donate_argnums=(0,),
      out_shardings=(train_state_sharding, repl_sharding))
  def update_fn(train_state, rng, batch):
    step_rng = jax.random.fold_in(
        rng, bv_optim.get_count(train_state["opt"], jittable=True))
    rngs = {"dropout": step_rng,
            "vqvae": jax.random.fold_in(step_rng, 1)}
    inputs, ctx = batch_to_inputs(batch)

    def loss_fn(params, state):
      (logits, out), new_state = model.apply(
          {"params": params, "state": state}, inputs, ctx=ctx,
          train=True, rngs=rngs, mutable=["state"],
          update_dict=not config.get("freeze_dict", True))
      if task is not None:
        loss_rec, losses = task.loss_fn(logits, batch, config)
        loss_rec = jnp.mean(loss_rec)
        losses = {k: jnp.mean(v) for k, v in losses.items()}
      else:
        losses = {f"loss_{k}": task_loss_fn(task_losses[k], logits[k],
                                            inputs[k])
                  for k in logits}
        loss_rec = sum(losses.values())
      # Commitment term pulls the encoder toward its (stop-gradient)
      # quantized codes (ref vqvae.py:200-204).
      loss_commitment = jnp.mean(jnp.square(
          out["bottleneck"] - jax.lax.stop_gradient(out["bottleneck_q"])))
      total = loss_rec + config.get("w_commitment", 0.25) * loss_commitment
      extras = {**losses,
                "loss_rec": loss_rec, "loss_commitment": loss_commitment,
                "codebook_zeros_ratio": out["codebook_zeros_ratio"],
                "codebook_max_ratio": out["codebook_max_ratio"]}
      return total, (new_state["state"], extras)

    params, opt = train_state["params"], train_state["opt"]
    (loss, (new_state, extras)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params, train_state["state"])
    updates, opt = tx.update(grads, opt, params)
    params = optax.apply_updates(params, updates)
    gs = jax.tree.leaves(
        bv_optim.replace_frozen(config.schedule, grads, 0.))
    measurements = {
        "training_loss": loss, **extras,
        "l2_grads": jnp.sqrt(sum(jnp.vdot(g, g) for g in gs)),
        "l2_params": jnp.sqrt(sum(jnp.vdot(p, p)
                                  for p in jax.tree.leaves(params))),
        "l2_updates": jnp.sqrt(sum(jnp.vdot(v, v)
                                   for v in jax.tree.leaves(updates)))}
    return {"params": params, "opt": opt, "state": new_state}, measurements

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
    # Warm-start (params, state) from a stage-I checkpoint; typically
    # combined with freeze_dict/schedule freezing (ref vqvae.py:283-291).
    u.write_note(f"Initializing model from {config.model_init}...")
    with jax.transfer_guard("allow"):
      p, s = model_mod.load(
          jax.device_get(train_state["params"]), config.model_init,
          config.get("model"), **config.get("model_load", {}))
      train_state["params"] = u.reshard(p, params_sharding)
      train_state["state"] = u.reshard(
          s, jax.tree.map(lambda _: repl_sharding, s))

  def reconstruct_fn(train_state, batch):
    inputs, ctx = batch_to_inputs(batch)
    (logits, _) = model.apply(
        {"params": train_state["params"], "state": train_state["state"]},
        inputs, ctx=ctx)
    per_ex = {}
    for k in logits:
      if task_losses[k] == "xent":
        per_ex[f"loss_{k}"] = u.softmax_xent(
            logits=logits[k], labels=inputs[k], reduction=False).mean(
                axis=tuple(range(1, logits[k].ndim - 1)))
      else:
        per_ex[f"loss_{k}"] = jnp.mean(
            jnp.square(logits[k] - inputs[k]),
            axis=tuple(range(1, logits[k].ndim)))
    return per_ex

  predict_fns = {"reconstruct": reconstruct_fn}

  if task is not None:
    def validation_fn(train_state, batch):
      """Per-example task loss (for the compute_mean evaluator)."""
      inputs, ctx = batch_to_inputs(batch)
      logits, _ = model.apply(
          {"params": train_state["params"],
           "state": train_state["state"]}, inputs, ctx=ctx)
      total, _ = task.loss_fn(logits, batch, config)
      return {"loss": jnp.mean(total.reshape(total.shape[0], -1), -1)}

    def task_output_fn(train_state, batch, **kw):
      """Reconstruction rendered as the task output (panoptic map, depth
      or color image), for the task evaluators."""
      inputs, ctx = batch_to_inputs(batch)
      logits, _ = model.apply(
          {"params": train_state["params"],
           "state": train_state["state"]}, inputs, ctx=ctx)
      out = task.predict_outputs(logits, config, **kw)
      if config.task == "panoptic":  # [B,H,W,2] -> evaluator dict
        return {"semantics": out[..., 0], "instances": out[..., 1]}
      return out

    predict_fns["validation"] = validation_fn
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
  u.write_note("Starting UViM stage-I training loop...")
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
