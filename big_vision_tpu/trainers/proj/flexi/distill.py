"""FlexiViT distillation: a flexible student distilled from frozen teachers.

Parity target: reference trainers/proj/flexi/distill.py (the FlexiViT
paper's main recipe, arXiv:2212.08013). Per step, flexi args (seqhw) are
sampled on the host; each combination is its own jitted SPMD program
(static shapes). Loss is a distance (default KL) between student logits at
the sampled patchification and the frozen teachers' logits.
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
import big_vision_tpu.evaluators.proj.distill.distance as dd
import big_vision_tpu.input_pipeline as input_pipeline
import big_vision_tpu.optim as bv_optim
import big_vision_tpu.sharding as bv_sharding
import big_vision_tpu.trainers.proj.flexi.common as flexi
import big_vision_tpu.utils as u

NamedSharding = jax.sharding.NamedSharding
P = jax.sharding.PartitionSpec


def getfirst(d, *keys):
  for k in keys:
    if k in d:
      return d[k]
  raise KeyError(f"None of {keys} in {list(d)}")


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

  for m in config.get("pp_modules", ["ops_general", "ops_image"]):
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

  # num_classes is shared trainer-level config (ref flexi/distill.py:154).
  def make_model(name):
    mod = importlib.import_module(
        f"big_vision_tpu.models.{config[f'{name}_name']}")
    kw = dict(config.get(name, {}))
    if "num_classes" in config and "num_classes" not in kw:
      kw["num_classes"] = config.num_classes
    return mod, mod.Model(**kw)

  student_mod, student = make_model("student")
  teachers = {t: make_model(t) for t in config.teachers}
  models = {"student": student, **{t: m for t, (_, m) in teachers.items()}}

  def init(rng):
    img_size = tuple(config.init_shapes[0])
    rngs = jax.random.split(rng, len(models))
    return {
        name: m.init(r, jnp.zeros(img_size, jnp.float32))["params"]
        for (name, m), r in zip(models.items(), rngs)}

  rng, rng_init = jax.random.split(rng)
  with nn.logical_axis_rules(sharding_rules):
    params_shape = jax.eval_shape(init, rng_init)
  tx, sched_fns = bv_optim.make(
      config, nn.unbox(params_shape["student"]),
      sched_kw=dict(total_steps=total_steps, batch_size=batch_size,
                    data_size=ntrain_img))
  with nn.logical_axis_rules(sharding_rules):
    params_sharding = bv_sharding.infer_sharding(params_shape, strategy,
                                                 mesh)
  from big_vision_tpu.train import infer_opt_sharding
  opt_sharding = infer_opt_sharding(
      tx, nn.unbox(params_shape["student"]), params_sharding["student"],
      repl_sharding)
  train_state_sharding = {"params": params_sharding, "opt": opt_sharding}

  with jax.transfer_guard("allow"):
    rng_init = u.reshard(rng_init, repl_sharding)
  params = nn.unbox(jax.jit(init, out_shardings=params_sharding)(rng_init))
  opt = jax.jit(tx.init, out_shardings=opt_sharding)(params["student"])
  train_state = {"params": params, "opt": opt}
  del params, opt

  rng, rng_loop = jax.random.split(rng)
  with jax.transfer_guard("allow"):
    rng_loop = u.reshard(rng_loop, repl_sharding)

  flexi_argnames = sorted(config.flexi)

  def loss_fn(student_params, params, data, rng, **flexi_kw):
    params = {**params, "student": student_params}

    rngs = jax.random.split(rng, len(models))
    def fwd(name, w, r):
      return models[name].apply(
          {"params": w}, getfirst(data, name, "image"),
          train=name == "student",
          rngs={"dropout": r} if name == "student" else None,
          **(flexi_kw if name == "student" else {}))[0]
    logits = {name: fwd(name, w, r)
              for (name, w), r in zip(params.items(), rngs)}

    measurements = {}
    for name, lg in logits.items():
      if "labels" in data:
        measurements[f"task_loss_{name}"] = u.softmax_xent(
            logits=lg, labels=data["labels"], reduction=False)
    measurements["distill_loss"] = 0.0
    for name in config.teachers:
      l = dd.dist(logits["student"], logits[name],
                  config.get("distance", "kl"),
                  **config.get("distance_kw", {}))
      measurements[f"distill_loss_{name}"] = l
      measurements["distill_loss"] += l
    return jax.tree.map(jnp.mean,
                        (measurements["distill_loss"], measurements))

  @functools.partial(
      jax.jit, donate_argnums=(0,),
      static_argnames=tuple(flexi_argnames),
      out_shardings=(train_state_sharding, repl_sharding))
  def update_fn(train_state, rng, data, **flexi_kw):
    step_rng = jax.random.fold_in(
        rng, bv_optim.get_count(train_state["opt"], jittable=True))

    if config.get("mixup") and config.mixup.p:
      to_mix = {name: data[name]
                for name in ("image", "labels") + tuple(models)
                if name in data}
      step_rng, _, to_mix = u.mixup(step_rng, **config.mixup, **to_mix)
      data = {**data, **to_mix}

    params, opt = train_state["params"], train_state["opt"]
    w = params["student"]
    (l, measurements), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(w, params, data, step_rng, **flexi_kw)
    updates, opt = tx.update(grads, opt, w)
    w = optax.apply_updates(w, updates)
    measurements["training_loss"] = l
    measurements["l2_grads"] = optax.global_norm(grads)
    return {"params": {**params, "student": w}, "opt": opt}, measurements

  # Resume (student only; teachers are frozen, reloaded at start).
  first_step = 0
  ckpt_steps = get_steps("ckpt", default=None)
  ckpt_mgr = u.CheckpointManager() if (workdir and ckpt_steps) else None
  ckpt_prefix = os.path.join(workdir, "ckpt.bv") if workdir else None
  resumed = False
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
      resumed = True
    chrono.inform(first_step=first_step)

  with jax.transfer_guard("allow"):
    params = jax.device_get(train_state["params"])
    if not resumed and config.get("student_init"):
      params["student"] = student_mod.load(
          params["student"], config.student_init, config.get("student"),
          **config.get("student_load", {}))
    for name, (mod, _) in teachers.items():
      if ckpt := config.get(f"{name}_init"):
        u.write_note(f"Loading teacher {name} from {ckpt}...")
        params[name] = mod.load(params[name], ckpt, config.get(name),
                                **config.get(f"{name}_load", {}))
    train_state["params"] = u.reshard(params, params_sharding)

  def predict_fn(train_state, batch, **flexi_kw):
    logits, out = student.apply(
        {"params": train_state["params"]["student"]}, batch["image"],
        **flexi_kw)
    return logits, out

  @functools.cache
  def evaluators():
    return eval_common.from_config(
        config, flexi.mkpredictfns(predict_fn, config.flexi,
                                   "student_{x}"),
        write_note=u.write_note,
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
  u.write_note("Starting FlexiViT distillation loop...")
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

    np_rng = flexi.mkrng(-1, -1, step)
    flexi_kw = {n: int(flexi.choice(config.flexi[n].v, config.flexi[n].p,
                                    np_rng))
                for n in flexi_argnames}

    with nn.logical_axis_rules(sharding_rules), mesh:
      train_state, measurements = update_fn(train_state, rng_loop, batch,
                                            **flexi_kw)

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
