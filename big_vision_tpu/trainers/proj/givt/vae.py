"""GIVT VAE trainer: beta-VAE ELBO (MSE reconstruction + KL).

Parity target: reference trainers/proj/givt/vae.py (the GAN/perceptual
terms of the full recipe are marked TODO; the beta-weighted Gaussian ELBO
core is here).
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

import big_vision_tpu.input_pipeline as input_pipeline
import big_vision_tpu.optim as bv_optim
import big_vision_tpu.sharding as bv_sharding
import big_vision_tpu.utils as u
from big_vision_tpu.models.proj.givt import vae as vae_mod_lib

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
      f"big_vision_tpu.models.{config.get('model_name', 'proj.givt.vae')}")
  model = model_mod.Model(**config.get("model", {}))
  beta = config.get("beta", 1e-4)

  def init(rng):
    dummy = jnp.zeros(config.init_shapes[0], jnp.float32)
    return model.init(rng, dummy)["params"]

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

  @functools.partial(
      jax.jit, donate_argnums=(0,),
      out_shardings=(train_state_sharding, repl_sharding))
  def update_fn(train_state, rng, batch):
    step_rng = jax.random.fold_in(
        rng, bv_optim.get_count(train_state["opt"], jittable=True))

    def loss_fn(params):
      recon, out = model.apply({"params": params}, batch["image"],
                               train=True, rng=step_rng)
      mse = jnp.mean(jnp.square(recon - batch["image"]))
      kl = jnp.mean(vae_mod_lib.kl_divergence(out["mu"], out["logvar"]))
      return mse + beta * kl, {"mse": mse, "kl": kl}

    params, opt = train_state["params"], train_state["opt"]
    (loss, extras), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    updates, opt = tx.update(grads, opt, params)
    params = optax.apply_updates(params, updates)
    return {"params": params, "opt": opt}, {
        "training_loss": loss, **extras,
        "l2_grads": optax.global_norm(grads)}

  first_step = 0
  ckpt_steps = get_steps("ckpt", default=None)
  ckpt_mgr = u.CheckpointManager() if (workdir and ckpt_steps) else None
  ckpt_prefix = os.path.join(workdir, "ckpt.bv") if workdir else None
  if ckpt_prefix and (last := u.last_checkpoint_dir(ckpt_prefix)):
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

  log_steps = get_steps("log_training", default=50)
  u.write_note("Starting VAE training loop...")
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
    mw.step_end()

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
