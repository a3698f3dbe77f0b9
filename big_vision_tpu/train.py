"""Canonical classification trainer (pretrain + transfer).

Parity target: reference big_vision/train.py:72-518, restructured around the
TPU-native data plane. One jitted, donated `update_fn` is the entire hot
loop; input feeding, metrics readback and checkpointing are all async
against it.

Run: python -m big_vision_tpu.train --config .../cfg.py:arg --workdir /tmp/wd
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

# Registry side-effects for pp ops used by configs.
import big_vision_tpu.pp.ops_general  # noqa: F401
import big_vision_tpu.pp.ops_image  # noqa: F401

NamedSharding = jax.sharding.NamedSharding
P = jax.sharding.PartitionSpec


def _shard_map(fn, mesh, in_specs, out_specs):
  try:
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs)
  except (AttributeError, TypeError):  # older jax
    from jax.experimental.shard_map import shard_map
    return shard_map(fn, mesh, in_specs=in_specs, out_specs=out_specs)


def infer_opt_sharding(tx, params_shape, params_sharding, repl_sharding):
  """Shards optimizer slots like their matching param (by shape), replicating
  everything else (factored vectors, counts)."""
  shape_to_sharding = {}
  shapes_flat = u.tree_flatten_with_names(
      jax.tree.map(lambda x: x.shape, params_shape))[0]
  shardings_flat = u.tree_flatten_with_names(params_sharding)[0]
  for (_, shape), (_, sharding) in zip(shapes_flat, shardings_flat):
    shape_to_sharding.setdefault(shape, sharding)
  opt_shape = jax.eval_shape(tx.init, params_shape)
  return jax.tree.map(
      lambda x: shape_to_sharding.get(getattr(x, "shape", None),
                                      repl_sharding), opt_shape)


def main(argv=None, *, config=None, workdir=None):
  prev_guard = getattr(jax.config, "jax_transfer_guard", None) or "allow"
  try:
    return _main(argv, config=config, workdir=workdir)
  finally:
    # Don't leak the strict guard into callers (tests, notebooks, drivers).
    jax.config.update("jax_transfer_guard", prev_guard)


def _main(argv=None, *, config=None, workdir=None):
  del argv
  if config is None:
    config = flags.FLAGS.config
    workdir = flags.FLAGS.workdir

  # Multi-host bootstrap: every host runs this same program; global arrays
  # unify them. Gated on env like the reference (train.py:76-77).
  if os.environ.get("BV_JAX_INIT"):
    jax.distributed.initialize()

  # All host<->device transfers must be explicit.
  jax.config.update("jax_transfer_guard", "disallow")

  # Import pp op modules named by the config (registry side-effects).
  for m in config.get("pp_modules", ["ops_general", "ops_image", "autoaugment"]):
    importlib.import_module(f"big_vision_tpu.pp.{m}")

  mw = u.MetricWriter(workdir if jax.process_index() == 0 else None,
                      echo=config.get("log_training_verbose", True))
  chrono = u.chrono
  chrono.inform(measure=mw.measure, write_note=u.write_note)

  with jax.transfer_guard("allow"):
    rng = jax.random.PRNGKey(config.get("seed", 0))

  # ----------------------------------------------------------------------
  # Mesh & sharding strategy.
  # ----------------------------------------------------------------------
  u.write_note("Creating device mesh...")
  mesh = u.create_device_mesh(config.get("mesh", [("data", -1)]))
  devices_flat = mesh.devices.flatten()
  repl_sharding = NamedSharding(mesh, P())
  sharding_rules = config.get("sharding_rules", [("act_batch", "data")])
  strategy = config.get("sharding_strategy", [(".*", "replicate")])

  # ----------------------------------------------------------------------
  # Input pipeline.
  # ----------------------------------------------------------------------
  u.write_note("Initializing input pipeline...")
  batch_size = config.input.batch_size
  assert batch_size % jax.device_count() == 0, (
      f"Global batch {batch_size} % {jax.device_count()} devices != 0")
  # Only the example count is needed here; the iterator itself is built
  # AFTER the resume ladder so a resumed run can fast-forward the raw
  # stream to its exact sample position.
  ntrain_img = input_pipeline.total_training_examples(config.input)


  total_steps = u.steps("total", config, ntrain_img, batch_size)
  def get_steps(name, default=ValueError, cfg=config):
    return u.steps(name, cfg, ntrain_img, batch_size, total_steps, default)
  chrono.inform(first_step=0, total_steps=total_steps, global_bs=batch_size,
                steps_per_epoch=ntrain_img / batch_size)
  u.write_note(f"Training for {total_steps} steps on {ntrain_img} examples")

  # ----------------------------------------------------------------------
  # Model init (abstract first, then jit-materialized into shardings).
  # ----------------------------------------------------------------------
  u.write_note(f"Creating {config.model_name} model...")
  model_mod = importlib.import_module(
      f"big_vision_tpu.models.{config.model_name}")
  model = model_mod.Model(
      num_classes=config.num_classes, **config.get("model", {}))

  if "init_shapes" in config:
    init_shape = config.init_shapes[0]
  else:
    # Reference configs omit init_shapes; derive the post-pp image shape
    # from the data like the reference does (ref train.py:195-197).
    spec = input_pipeline.element_spec(config.input)["image"]
    init_shape = (1, *spec.shape)

  def init(rng):
    dummy = jnp.zeros(init_shape, jnp.float32)
    params = model.init(rng, dummy, train=True)["params"]
    if config.get("init_head_bias") is not None:
      params["head"]["bias"] = jnp.full_like(
          params["head"]["bias"], config["init_head_bias"])
    return params

  rng, rng_init = jax.random.split(rng)
  with nn.logical_axis_rules(sharding_rules):
    params_shape = jax.eval_shape(init, rng_init)

  tx, sched_fns = bv_optim.make(
      config, nn.unbox(params_shape),
      sched_kw=dict(total_steps=total_steps, batch_size=batch_size,
                    data_size=ntrain_img))

  with nn.logical_axis_rules(sharding_rules):
    params_sharding = bv_sharding.infer_sharding(
        params_shape, strategy, mesh)
  opt_sharding = infer_opt_sharding(
      tx, nn.unbox(params_shape), params_sharding, repl_sharding)
  train_state_sharding = {"params": params_sharding, "opt": opt_sharding}

  u.write_note("Materializing params...")
  with jax.transfer_guard("allow"):
    rng_init = u.reshard(rng_init, repl_sharding)
  with nn.logical_axis_rules(sharding_rules):
    params = nn.unbox(
        jax.jit(init, out_shardings=params_sharding)(rng_init))
  opt = jax.jit(tx.init, out_shardings=opt_sharding)(params)
  train_state = {"params": params, "opt": opt}
  del params, opt

  parameter_overview(train_state["params"], mw)

  rng, rng_loop = jax.random.split(rng, 2)
  with jax.transfer_guard("allow"):
    rng_loop = u.reshard(rng_loop, repl_sharding)

  # ----------------------------------------------------------------------
  # Update step (the hot loop: one fused XLA program).
  # ----------------------------------------------------------------------
  @functools.partial(
      jax.jit, donate_argnums=(0,),
      out_shardings=(train_state_sharding, repl_sharding))
  def update_fn(train_state, rng, batch):
    images, labels = batch["image"], batch["labels"]

    if config.get("mixup") and config.mixup.p:
      # Device-local mixup: roll within each shard, no collectives.
      axis = mesh.axis_names[0]
      def mixup_local(rng, images, labels):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        _, (images, labels), _ = u.mixup(rng, images, labels,
                                         p=config.mixup.p)
        return images, labels
      images, labels = _shard_map(
          mixup_local, mesh,
          in_specs=(P(), P(axis), P(axis)),
          out_specs=(P(axis), P(axis)))(rng, images, labels)

    step_rng = jax.random.fold_in(
        rng, bv_optim.get_count(train_state["opt"], jittable=True))

    def loss_fn(params):
      logits, _ = model.apply(
          {"params": params}, images, train=True,
          rngs={"dropout": step_rng})
      loss_name = config.get("loss", "sigmoid_xent")
      return getattr(u, loss_name)(logits=logits, labels=labels)

    params, opt = train_state["params"], train_state["opt"]
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt = tx.update(grads, opt, params)
    params = optax.apply_updates(params, updates)

    def l2(tree):
      return jnp.sqrt(sum(jnp.vdot(x, x) for x in jax.tree.leaves(tree)))
    measurements = {"training_loss": loss, "l2_grads": l2(grads),
                    "l2_params": l2(params), "l2_updates": l2(updates)}
    return {"params": params, "opt": opt}, measurements

  # ----------------------------------------------------------------------
  # Resume ladder: ckpt-LAST > config.resume > config.model_init > scratch.
  # ----------------------------------------------------------------------
  first_step = 0
  ckpt_steps = get_steps("ckpt", default=None)
  ckpt_mgr = u.CheckpointManager() if (workdir and ckpt_steps) else None
  ckpt_prefix = os.path.join(workdir, "ckpt.bv") if workdir else None

  resume_path = None
  if ckpt_prefix and (last := u.last_checkpoint_dir(ckpt_prefix)):
    resume_path = last
  elif config.get("resume"):
    resume_path = config.resume

  if resume_path:
    u.write_note(f"Resuming from {resume_path}...")
    with jax.transfer_guard("allow"):
      abstract = jax.tree.map(
          lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
          train_state, train_state_sharding)
      loaded = u.load_checkpoint(
          {**abstract,
           "chrono": jax.ShapeDtypeStruct((4,), np.float64)}, resume_path)
      # Every host must agree on timing state even when workdirs are NOT
      # on shared storage (per-host disks can hold stale checkpoints):
      # host 0's chrono is authoritative (ref train.py:478).
      chrono_state = np.asarray(loaded.pop("chrono"))
      if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        chrono_state = multihost_utils.broadcast_one_to_all(chrono_state)
      chrono.load(chrono_state)
      train_state = loaded
      first_step = bv_optim.get_count(train_state["opt"])
    chrono.inform(first_step=first_step)
  elif config.get("model_init"):
    u.write_note(f"Initializing from {config.model_init}...")
    with jax.transfer_guard("allow"):
      loaded = model_mod.load(
          jax.device_get(train_state["params"]), config.model_init,
          dict(config.get("model", {})), **config.get("model_load", {}))
      train_state["params"] = u.reshard(loaded, params_sharding)

  train_iter = input_pipeline.training_from_step(
      config.input, first_step, devices=devices_flat,
      seed=config.get("seed", 0))

  # ----------------------------------------------------------------------
  # Evaluators.
  # ----------------------------------------------------------------------
  def validation_fn(train_state, batch):
    logits, _ = model.apply({"params": train_state["params"]},
                            batch["image"])
    return logits, {}

  def repr_fn(train_state, batch):
    _, out = model.apply({"params": train_state["params"]}, batch["image"])
    return (out["pre_logits"],)

  predict_fns = {"predict": validation_fn, "represent": repr_fn}

  @functools.cache
  def evaluators():
    return eval_common.from_config(
        config, predict_fns, write_note=u.write_note,
        get_steps=lambda key, cfg: u.steps(
            key, cfg, ntrain_img, batch_size, total_steps, default=None),
        devices=list(devices_flat))

  last_eval_step = {}

  def run_evals(step, final=False, initial=False):
    for (name, evaluator, log_steps, prefix) in evaluators():
      if initial and config.evals[name].get("skip_first"):
        continue
      due = final or (log_steps and step % log_steps == 0)
      if due and last_eval_step.get(name) != step:
        last_eval_step[name] = step
        chrono.pause(wait_for=jax.tree.leaves(train_state["params"]))
        with chrono.log_timing(f"z/secs/eval/{name}"):
          with nn.logical_axis_rules(sharding_rules), \
               jax.transfer_guard("allow"), mesh:
            for key, value in evaluator.run(train_state):
              mw.measure(f"{prefix}{key}", value)
        chrono.resume()

  # ----------------------------------------------------------------------
  # Train loop.
  # ----------------------------------------------------------------------
  log_steps = get_steps("log_training", default=50)
  u.write_note("Starting training loop...")
  if first_step in (total_steps, 0):
    # Initial-or-final evals (ref train.py:410-418): a fresh run evals at
    # step 0 minus `skip_first` evaluators; a fully-trained resume runs
    # the final evals it may have been preempted out of.
    mw.step_start(first_step)
    run_evals(first_step, final=True, initial=first_step != total_steps)
    mw.step_end()

  prof_sess = None
  prof_dir = (os.path.join(workdir, "plugins", "profile")
              if workdir and config.get("profile") else None)

  step = first_step
  for step in range(first_step + 1, total_steps + 1):
    mw.step_start(step)
    if prof_dir:
      prof_sess = u.startstop_prof(prof_sess, step, first_step, log_steps,
                                   logdir=prof_dir)
    with jax.profiler.StepTraceAnnotation("train_step", step_num=step):
      batch = next(train_iter)
      # Host-side keys (strings, keep_on_cpu) are for eval/debug paths;
      # the jitted update only sees device arrays.
      batch = {k: v for k, v in batch.items() if isinstance(v, jax.Array)}
      with nn.logical_axis_rules(sharding_rules), mesh:
        train_state, measurements = update_fn(train_state, rng_loop, batch)

    if (log_steps and step % log_steps == 0) or step == total_steps:
      with jax.transfer_guard("allow"):
        for name, value in measurements.items():
          v = mw.measure(name, value)
          if name == "training_loss" and not np.isfinite(v):
            raise RuntimeError(
                f"Train loss became {v} at step {step}; aborting.")
        for i, sched_fn in enumerate(sched_fns):
          mw.measure(f"global_schedule{i if i else ''}",
                     np.asarray(sched_fn(step - 1)))
        chrono.tick(step)
        u.log_memory(mw.measure)

    if (ckpt_mgr and ckpt_steps and
        (step % ckpt_steps == 0 or step == total_steps)):
      chrono.pause(wait_for=jax.tree.leaves(train_state))
      with jax.transfer_guard("allow"), chrono.log_timing("z/secs/ckpt"):
        keep_steps = get_steps("keep_ckpt", default=None)
        ckpt_mgr.save(
            {**train_state, "chrono": u.put_cpu(chrono.save())},
            ckpt_prefix, step,
            keep=bool(keep_steps and step % keep_steps == 0))
      chrono.resume()

    run_evals(step)
    mw.step_end()

    if config.get("stop_after_steps") and step >= config.stop_after_steps:
      # Simulated preemption (tests/ops drills): exit the loop early with
      # schedules, duration resolution, and checkpoints exactly as a real
      # preemption would leave them; a restart resumes from ckpt-LAST.
      u.write_note(f"stop_after_steps={config.stop_after_steps}: "
                   "stopping early (simulated preemption).")
      break

  stopped_early = bool(config.get("stop_after_steps")
                       and step < total_steps)
  if total_steps > 0 and not stopped_early:
    # A real preemption never reaches final evals; the simulated one
    # (stop_after_steps) must not either.
    run_evals(step, final=True)

  if ckpt_mgr:
    ckpt_mgr.close()
  mw.close()
  u.write_note(f"Done: trained {step} of {total_steps} steps"
               + (" (stopped early, simulated preemption)."
                  if stopped_early else "."))
  u.sync()
  return train_state


def parameter_overview(params, mw):
  named, _ = u.tree_flatten_with_names(params)
  total = sum(int(np.prod(v.shape)) for _, v in named)
  u.write_note(f"Model has {total:,} parameters in {len(named)} arrays")
  mw.measure("num_params", total)


if __name__ == "__main__":
  config_flags.DEFINE_config_file(
      "config", None, "Training configuration.", lock_config=True)
  flags.DEFINE_string("workdir", default=None, help="Work unit directory.")
  jax.config.parse_flags_with_absl()
  flags.mark_flags_as_required(["config"])
  app.run(lambda argv: (main(argv), None)[-1])
