"""GIVT VAE trainer: beta-VAE ELBO (l2 or categorical-xent reconstruction).

Parity target: reference trainers/proj/givt/vae.py — `vae_loss_fn`
(ref :264-296) with rec_loss_fn "l2" (0.5 * per-example summed square
error) or "xent" (per-channel categorical xent over `model.inout_specs`,
optional `mask_zero_target`), Gaussian KL summed per example, beta
weighting, plus the validation / predict / predict_panoptic /
predict_depth eval fns (ref :406-443).
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
from big_vision_tpu.trainers.proj.givt import utils as gutils

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
  beta = config.get("beta", 1.0)

  def vae_loss_fn(logits, image, mu, logvar, keep_batch_dim=False):
    """Reference vae_loss_fn (trainers/proj/givt/vae.py:264-296)."""
    rec_loss_fn = config.get("rec_loss_fn", "l2")
    if rec_loss_fn == "l2":
      loss_rec = 0.5 * jnp.sum(
          jnp.square(logits - image), axis=tuple(range(1, logits.ndim)))
    elif rec_loss_fn == "xent":
      loss_rec = 0.0
      for k, (in_ch, _) in config.model.inout_specs.items():
        cur_logits = logits[k]
        b, c = cur_logits.shape[0], cur_logits.shape[-1]
        labels_flat = image[..., in_ch].reshape((b, -1)).astype(jnp.int32)
        if config.get("mask_zero_target", False):
          weights = (labels_flat != 0).astype(jnp.float32)
        else:
          weights = None
        loss_rec += u.weighted_softmax_xent(
            logits=cur_logits.reshape((b, -1, c)),
            labels=labels_flat, reduction=False, weights=weights)
    else:
      raise ValueError(f"Unknown reconstruction loss: {rec_loss_fn}")
    loss_kl = -0.5 * jnp.sum(
        1 + logvar - jnp.square(mu) - jnp.exp(logvar),
        axis=tuple(range(1, mu.ndim)))
    if not keep_batch_dim:
      loss_rec, loss_kl = jnp.mean(loss_rec), jnp.mean(loss_kl)
    loss = loss_rec + beta * loss_kl
    return loss, {"loss": loss, "loss_rec": loss_rec, "loss_kl": loss_kl}

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
      return vae_loss_fn(recon, batch["image"], out["mu"], out["logvar"])

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
    # Warm-start from a pretrained VAE (ref givt/vae.py:382-386).
    u.write_note(f"Initializing model from {config.model_init}...")
    with jax.transfer_guard("allow"):
      loaded = model_mod.load(
          jax.device_get(train_state["params"]), config.model_init,
          config.get("model", {}), **config.get("model_load", {}))
      train_state["params"] = u.reshard(loaded, params_sharding)

  # Eval fns (ref trainers/proj/givt/vae.py:406-443): "validation" feeds a
  # mean evaluator with per-example ELBO terms; "predict" exposes raw
  # decode logits; the panoptic/depth variants post-process into the
  # evaluator contracts ({"semantics","instances"} maps / {"depth"}).
  def validation_fn(train_state, batch, seed=0):
    local_rng = gutils.get_local_rng(seed, batch)
    recon, out = model.apply({"params": train_state["params"]},
                             batch["image"], train=True, rng=local_rng)
    _, aux = vae_loss_fn(recon, batch["image"], out["mu"], out["logvar"],
                         keep_batch_dim=True)
    return jax.tree.map(
        lambda x: jnp.mean(x, axis=tuple(range(1, x.ndim))), aux)

  def predict_fn(train_state, batch, seed=0):
    image = batch["image"] if isinstance(batch, dict) else batch
    local_rng = gutils.get_local_rng(seed, {"image": image})
    recon, _ = model.apply({"params": train_state["params"]}, image,
                           train=True, rng=local_rng)
    return {"logits": recon}

  def predict_fn_panoptic(train_state, batch, **kw):
    from big_vision_tpu.trainers.proj.uvim import panoptic_task
    logits = predict_fn(train_state, batch)["logits"]
    out = panoptic_task.panoptic_predictions_from_logits(
        logits["semantics"], logits["instances"], **kw)
    return {"semantics": out[..., 0], "instances": out[..., 1]}

  def predict_fn_depth(train_state, batch):
    depth_logits = predict_fn(train_state, batch)["logits"]["depth"]
    return {"depth": gutils.unbin_depth(
        depth_logits, min_depth=config.min_depth,
        max_depth=config.max_depth,
        num_bins=config.model.inout_specs["depth"][1])}

  @functools.cache
  def evaluators():
    return eval_common.from_config(
        config, {"predict": predict_fn,
                 "predict_panoptic": predict_fn_panoptic,
                 "predict_depth": predict_fn_depth,
                 "validation": validation_fn},
        write_note=u.write_note,
        get_steps=lambda key, cfg: u.steps(
            key, cfg, ntrain_img, batch_size, total_steps, default=None),
        devices=list(devices_flat))

  last_eval = {}

  def run_evals(step, final=False, initial=False):
    for (name, evaluator, eval_log_steps, prefix) in evaluators():
      if initial and config.evals[name].get("skip_first"):
        continue
      due = final or (eval_log_steps and step % eval_log_steps == 0)
      if due and last_eval.get(name) != step:
        last_eval[name] = step
        chrono.pause(wait_for=jax.tree.leaves(train_state["params"]))
        with nn.logical_axis_rules(sharding_rules), \
             jax.transfer_guard("allow"), mesh:
          for key, value in evaluator.run(train_state):
            mw.measure(f"{prefix}{key}", value)
        chrono.resume()

  log_steps = get_steps("log_training", default=50)
  u.write_note("Starting VAE training loop...")
  if first_step in (total_steps, 0):
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
