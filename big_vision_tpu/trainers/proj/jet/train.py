"""Jet trainer: flow maximum likelihood in bits/dim.

Parity target: reference trainers/proj/jet/train.py:71. Input images are
uniform-dequantized uint8s; loss is the exact NLL under a standard-normal
latent prior plus the flow log-determinant, reported in bits/dim
(including the -log2(bin_width) discretization term; the bin width
follows `config.data_range`, so value_range(-1, 1) configs reproduce the
reference's log(127.5) constant, ref train.py:272-284). Optional
class-conditional flow: a one-hot "label" becomes a single cross-attended
context token, dropped whole-batch with `condition_drop_prob`
(ref :306-310) so the flow also models the unconditional density.
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


def nll_bits_per_dim(z, logdet, bin_width=1.0 / 256.0):
  """-log p(x) in bits/dim for uint8 data dequantized to bins of
  `bin_width` in model space; returns (bits, nll, logdet) per example,
  each already normalized to bits/dim (ref train.py:272-284)."""
  ndims = np.prod(z.shape[1:])
  logp_z = -0.5 * jnp.sum(z ** 2 + jnp.log(2 * jnp.pi),
                          axis=range(1, z.ndim))
  nll_nats = -logp_z - ndims * jnp.log(bin_width)
  normalizer = ndims * jnp.log(2.0)
  return ((nll_nats - logdet) / normalizer, nll_nats / normalizer,
          logdet / normalizer)


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

  model_mod = importlib.import_module(
      f"big_vision_tpu.models.{config.get('model_name', 'proj.jet.jet')}")
  model = model_mod.Model(**config.get("model", {}))

  def init(rng):
    dummy = jnp.zeros(config.init_shapes[0], jnp.float32)
    return model.init(rng, dummy)["params"]

  rng, rng_init = jax.random.split(rng)
  with nn.logical_axis_rules(sharding_rules):
    params_shape = jax.eval_shape(init, rng_init)
  # Coupling projections are structural constants: always frozen.
  schedule = config.get("schedule", dict(decay_type="cosine"))
  if not isinstance(schedule, (list, tuple)):
    schedule = [(".*FREEZE_ME.*", None), (".*", dict(schedule))]
  config_d = dict(config)
  config_d["schedule"] = schedule
  tx, sched_fns = bv_optim.make(
      config_d, nn.unbox(params_shape),
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

  # uint8 levels span config.data_range, so one quantization bin is
  # (hi - lo)/255 wide: 2/255 for the reference's value_range(-1, 1)
  # (= its log(127.5) constant), 1/255 for the default [0, 1] range.
  lo, hi = config.get("data_range", (0.0, 1.0))
  bin_width = (hi - lo) / 255.0

  def batch_context(batch, rng=None):
    """One-hot label -> one context token; whole-batch label drop."""
    if (label := batch.get("label")) is None or label.ndim != 2:
      return None
    context = label[:, None, :]  # [B, 1, num_classes]
    if rng is not None:
      drop = (config.get("condition_drop_prob", 0.1)
              > jax.random.uniform(rng, (), jnp.float32))
      context = context * (~drop)
    return context

  @functools.partial(
      jax.jit, donate_argnums=(0,),
      out_shardings=(train_state_sharding, repl_sharding))
  def update_fn(train_state, rng, batch):
    step_rng = jax.random.fold_in(
        rng, bv_optim.get_count(train_state["opt"], jittable=True))
    rng_noise, rng_drop = jax.random.split(step_rng)

    def loss_fn(params):
      x = batch["image"]
      x = x + jax.random.uniform(rng_noise, x.shape) * bin_width
      z, logdet = model.apply({"params": params}, x,
                              context=batch_context(batch, rng_drop))
      bits, nll, ld = nll_bits_per_dim(z, logdet, bin_width)
      return jnp.mean(bits), {"bits": jnp.mean(bits),
                              "nll": jnp.mean(nll),
                              "logdet": jnp.mean(ld)}

    params, opt = train_state["params"], train_state["opt"]
    (loss, extras), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    updates, opt = tx.update(grads, opt, params)
    params = optax.apply_updates(params, updates)
    gs = jax.tree.leaves(
        bv_optim.replace_frozen(config_d["schedule"], grads, 0.))
    return {"params": params, "opt": opt}, {
        "training_loss": loss, "bits_per_dim": loss, **extras,
        "l2_grads": jnp.sqrt(sum(jnp.vdot(g, g) for g in gs)),
        "l2_params": jnp.sqrt(sum(jnp.vdot(p, p)
                                  for p in jax.tree.leaves(params))),
        "l2_updates": jnp.sqrt(sum(jnp.vdot(v, v)
                                   for v in jax.tree.leaves(updates)))}

  first_step = 0
  ckpt_steps = get_steps("ckpt", default=None)
  ckpt_mgr = u.CheckpointManager() if (workdir and ckpt_steps) else None
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
    u.write_note(f"Initializing model from {config.model_init}...")
    with jax.transfer_guard("allow"):
      loaded = model_mod.load(
          jax.device_get(train_state["params"]), config.model_init,
          config.get("model", {}), **config.get("model_load", {}))
      train_state["params"] = u.reshard(loaded, params_sharding)

  def bpd_fn(train_state, batch):
    x = batch["image"] + 0.5 * bin_width  # deterministic half-bin dequant
    z, logdet = model.apply({"params": train_state["params"]}, x,
                            context=batch_context(batch))
    bits, nll, ld = nll_bits_per_dim(z, logdet, bin_width)
    return {"bits_per_dim": bits, "nll": nll, "logdet": ld}

  predict_fns = {"bits_per_dim": bpd_fn}

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
  u.write_note("Starting Jet training loop...")
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
