"""GIVT trainer: GMM NLL over (frozen-)VAE latent token sequences.

Parity target: reference trainers/proj/givt/generative.py. Each step: the
frozen Gaussian VAE encodes images to latent tokens (sampled via the
reparameterization trick, acting as data augmentation); GIVT maximizes
their likelihood, causally ("ar") or with MaskGIT masking ("masked" — the
loss is then restricted to masked positions, ref :342-358). An optional
invertible adaptor (`config.adaptor_name`, ref :199-233) is trained
jointly: it maps VAE latents into GIVT's modeling space (forward) and
back before VAE decoding (inverse); its params live in
`params["params_adaptor"]` exactly like the reference so checkpoints are
tree-compatible. Predict fns mirror ref :410-556: validation,
sample_teacher_forced, sample, sample_panoptic, sample_depth,
representation.
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

  for m in config.get("pp_modules", ["ops_general", "ops_image", "ops_text",
                                    "proj.uvim.pp_ops", "proj.givt.pp_ops"]):
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

  # Frozen VAE tokenizer.
  vae_mod = importlib.import_module(
      f"big_vision_tpu.models.{config.vae.get('model_name', 'proj.givt.vae')}")
  vae = vae_mod.Model(**config.vae.get("model", {}))
  with jax.transfer_guard("allow"):
    vae_params = jax.jit(lambda k: vae.init(
        k, jnp.zeros(config.vae.init_shapes[0], jnp.float32))["params"])(
            jax.random.PRNGKey(11))
    if config.vae.get("model_init"):
      vae_params = vae_mod.load(jax.device_get(vae_params),
                                config.vae.model_init,
                                **config.vae.get("model_load", {}))
      vae_params = u.reshard(
          vae_params, jax.tree.map(lambda _: repl_sharding, vae_params))

  model_mod = importlib.import_module(
      f"big_vision_tpu.models.{config.get('model_name', 'proj.givt.givt')}")
  model = model_mod.Model(**config.get("model", {}))

  # Optional invertible adaptor between VAE latents and GIVT space,
  # trained jointly (ref generative.py:199-206).
  if config.get("adaptor_name"):
    adaptor_mod = importlib.import_module(
        f"big_vision_tpu.models.{config.adaptor_name}")
    adaptor = adaptor_mod.Model(num_channels=model.out_dim,
                                **config.adaptor.get("model", {}))
  else:
    adaptor = None

  # UViM-style GIVT: the VAE tokenizes the task output (config.vae.inkey,
  # e.g. "labels" depth/panoptic maps) while the transformer conditions on
  # the RGB image through its encoder (config.cond_image).
  vae_inkey = dict(config.vae).get("inkey", "image")
  cond_image = config.get("cond_image")  # e.g. "image" for UViM tasks

  def get_labels(batch):
    if not model.num_labels:
      return None
    labels = batch.get("labels", batch.get("label"))
    return None if labels is None else labels.astype(jnp.int32)

  def init(rng):
    seq = jnp.zeros((1, model.seq_len, model.out_dim), jnp.float32)
    labels = jnp.zeros((1,), jnp.int32) if model.num_labels else None
    mask = (jnp.zeros((1, model.seq_len), bool)
            if model.style == "masked" else None)
    image = (jnp.zeros((1, *model.input_size, 3), jnp.float32)
             if cond_image is not None else None)
    params = model.init(rng, seq, labels, image=image,
                        input_mask=mask)["params"]
    if adaptor is not None:
      # Stored inside the same params dict, as in the reference
      # (generative.py:229-233), so checkpoints are tree-compatible.
      _, rng_adaptor = jax.random.split(rng)
      params = dict(params)
      params["params_adaptor"] = adaptor.init(rng_adaptor, seq)["params"]
    return params

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

  def latents_of(batch, rng):
    mu, logvar = vae.apply({"params": vae_params}, batch[vae_inkey],
                           method=vae.encode)
    return vae.apply({"params": vae_params}, mu, logvar, rng,
                     method=vae.reparametrize)

  def loss_fn(params, batch, rng):
    """Reference loss_fn (generative.py:314-360): NLL of the (optionally
    adaptor-transformed) latent sequence, mean over ALL dims (incl.
    channels); masked mode averages only over masked positions
    (`mean(where=mask)`, MaskGIT-style)."""
    r_lat, r_mask, r_drop, r_train = jax.random.split(rng, 4)
    sequence = latents_of(batch, r_lat)
    if adaptor is not None:
      # iRevNet couplings are volume-preserving, so no log-det term.
      sequence = adaptor.apply({"params": params["params_adaptor"]},
                               sequence, method=adaptor.forward)
    labels = get_labels(batch)
    input_mask = model.get_input_mask_training(r_mask, sequence.shape[:2])
    drop_labels = model.get_drop_labels(r_drop, sequence.shape[0])

    if cond_image is not None:
      (logits, pdf) = model.apply(
          {"params": params}, sequence, labels=labels,
          image=batch[cond_image], input_mask=input_mask,
          drop_labels=drop_labels, train=True,
          rngs={"dropout": r_train})
      del logits
    else:
      logits = model.apply(
          {"params": params}, sequence, labels=labels,
          input_mask=input_mask, drop_labels=drop_labels, train=True,
          rngs={"dropout": r_train}, method=model.decode)
      pdf = model.apply({"params": params}, logits, method=model.get_pdf)

    nll = -pdf.log_prob(sequence)  # [B, L] or [B, L, D] per-channel
    metrics = {"nll": nll}
    if input_mask is not None:  # masked mode: only masked positions
      metrics["fraction_masked_out"] = (
          input_mask.astype(jnp.float32).mean(axis=1))
      mask = input_mask[:, :, None] if nll.ndim == 3 else input_mask
      nll = jnp.where(mask, nll, 0.0)
      loss = nll.mean(where=mask)
    else:
      loss = nll.mean()
    return loss, metrics

  @functools.partial(
      jax.jit, donate_argnums=(0,),
      out_shardings=(train_state_sharding, repl_sharding))
  def update_fn(train_state, rng, batch):
    step_rng = jax.random.fold_in(
        rng, bv_optim.get_count(train_state["opt"], jittable=True))
    _, rng_model = jax.random.split(step_rng)

    params, opt = train_state["params"], train_state["opt"]
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, batch, rng_model)
    updates, opt = tx.update(grads, opt, params)
    params = optax.apply_updates(params, updates)

    measurements = {"training_loss": loss}
    gs = jax.tree.leaves(
        bv_optim.replace_frozen(config.schedule, grads, 0.))
    measurements["l2_grads"] = jnp.sqrt(sum(jnp.vdot(g, g) for g in gs))
    ps = jax.tree.leaves(params)
    measurements["l2_params"] = jnp.sqrt(sum(jnp.vdot(p, p) for p in ps))
    us = jax.tree.leaves(updates)
    measurements["l2_updates"] = jnp.sqrt(sum(jnp.vdot(v, v) for v in us))
    if adaptor is not None:
      ps_a = jax.tree.leaves(params["params_adaptor"])
      measurements["l2_params_adaptor"] = jnp.sqrt(
          sum(jnp.vdot(p, p) for p in ps_a))
    measurements.update(
        {f"train/{k}": v.mean() for k, v in metrics.items()})
    return {"params": params, "opt": opt}, measurements

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
    with jax.transfer_guard("allow"):
      loaded = model_mod.load(
          jax.device_get(train_state["params"]), config.model_init,
          config.get("model", {}), **config.get("model_load", {}))
      train_state["params"] = u.reshard(loaded, params_sharding)

  from big_vision_tpu.models.proj.givt import decode as givt_decode
  from big_vision_tpu.models.proj.givt import parallel_decode
  from big_vision_tpu.trainers.proj.givt import utils as gutils

  def adaptor_inverse(params, codes):
    if adaptor is None:
      return codes
    return adaptor.apply({"params": params["params_adaptor"]}, codes,
                         method=adaptor.inverse)

  def validation_fn(train_state, batch, seed=0):
    """Per-example means of the training aux metrics (ref :410-421)."""
    local_rng = gutils.get_local_rng(seed, batch)
    _, aux = loss_fn(train_state["params"], batch, local_rng)
    return {k: jnp.mean(v, axis=tuple(range(1, v.ndim)))
            for k, v in aux.items()}

  def maybe_encode_cond(params, batch):
    if cond_image is not None and cond_image in batch:
      return model.apply({"params": params}, batch[cond_image],
                         method=model.encode)
    return None

  def predict_fn_teacher_forcing(train_state, batch, seed=0):
    """Sample each position from the teacher-forced pdf, decode through
    the VAE (ref :423-457)."""
    params = train_state["params"]
    local_rng = gutils.get_local_rng(seed, batch)
    r_lat, r_sample = jax.random.split(local_rng)
    sequence = latents_of(batch, r_lat)
    if adaptor is not None:
      sequence = adaptor.apply({"params": params["params_adaptor"]},
                               sequence, method=adaptor.forward)
    input_mask = model.get_input_mask_teacher_forced(sequence.shape[:2])
    logits = model.apply(
        {"params": params}, sequence, labels=get_labels(batch),
        encoded=maybe_encode_cond(params, batch), input_mask=input_mask,
        method=model.decode)
    pdf = model.apply({"params": params}, logits, method=model.get_pdf)
    sampled = pdf.sample(seed=r_sample)
    sampled = adaptor_inverse(params, sampled)
    return {"logits": vae.apply({"params": vae_params}, sampled,
                                method=vae.decode)}

  def predict_fn_rep(train_state, batch, seed=0):
    """Pre-logits representations for probes (ref :459-471)."""
    assert model.style == "ar"
    params = train_state["params"]
    local_rng = gutils.get_local_rng(seed, batch)
    sequence = latents_of(batch, local_rng)
    if adaptor is not None:
      sequence = adaptor.apply({"params": params["params_adaptor"]},
                               sequence, method=adaptor.forward)
    placeholder_labels = (
        jnp.zeros((sequence.shape[0],), jnp.int32)
        if model.num_labels else None)
    logits, out = model.apply(
        {"params": params}, sequence, labels=placeholder_labels,
        encoded=maybe_encode_cond(params, batch), return_reps=True,
        method=model.decode)
    del logits
    return out

  def predict_fn_sampling(train_state, batch, seed=0):
    """Unconditional/class-/image-conditional sampling (ref :473-530):
    AR decode or MaskGIT parallel decode, adaptor inverse, VAE decode."""
    params = train_state["params"]
    labels = get_labels(batch)
    local_rng = gutils.get_local_rng(seed, batch)
    encoded = maybe_encode_cond(params, batch)

    if labels is not None:
      sampling_batch_size = labels.shape[0]
    elif "image" in batch:
      sampling_batch_size = batch["image"].shape[0]
    elif cond_image is not None and cond_image in batch:
      sampling_batch_size = batch[cond_image].shape[0]
    else:
      sampling_batch_size = config.get("sampling_batch_size", 4)

    code_logprobs = None
    if model.style == "ar":
      gen = dict(config.get("ar_generation_config", {}))
      sampled_codes, code_logprobs = givt_decode.generate(
          {"params": params}, model, local_rng,
          batch_size=sampling_batch_size, labels=labels, encoded=encoded,
          temperature_scales=gen.get("temp"),
          temperature_probs=gen.get("temp_probs"),
          cfg_weight=gen.get("cfg_inference_weight", 0.0),
          beam_size=gen.get("beam_size", 1),
          fan_size=gen.get("fan_size", 1),
          rand_top_k=gen.get("rand_top_k", False),
          rand_top_k_temp=gen.get("rand_top_k_temp", 1.0),
          return_logprobs=True)
    elif model.style == "masked":
      assert encoded is None
      sampled_codes = parallel_decode.decode_masked(
          params, model, local_rng, batch_size=sampling_batch_size,
          labels=labels,
          config=parallel_decode.MaskedGenerationConfig(
              **config.get("masked_generation_config", {})))
    else:
      raise NotImplementedError(model.style)

    sampled_codes = adaptor_inverse(params, sampled_codes)
    results = {"logits": vae.apply({"params": vae_params}, sampled_codes,
                                   method=vae.decode)}
    if code_logprobs is not None:
      results["logprobs"] = code_logprobs
    return results

  def predict_fn_sampling_panoptic(train_state, batch, seed=0,
                                   min_fraction=0.0):
    from big_vision_tpu.trainers.proj.uvim import panoptic_task
    logits = predict_fn_sampling(train_state, batch, seed)["logits"]
    out = panoptic_task.panoptic_predictions_from_logits(
        logits["semantics"], logits["instances"],
        min_fraction=min_fraction)
    return {"semantics": out[..., 0], "instances": out[..., 1]}

  def predict_fn_sampling_depth(train_state, batch, seed=0):
    depth = predict_fn_sampling(train_state, batch, seed)["logits"]["depth"]
    return {"depth": gutils.unbin_depth(
        depth, min_depth=config.min_depth, max_depth=config.max_depth,
        num_bins=dict(config.vae.model)["inout_specs"]["depth"][1])}

  predict_fns = {
      "validation": validation_fn,
      "nll": validation_fn,  # legacy alias
      "sample_teacher_forced": predict_fn_teacher_forcing,
      "sample": predict_fn_sampling,
      "sample_panoptic": predict_fn_sampling_panoptic,
      "sample_depth": predict_fn_sampling_depth,
      "representation": predict_fn_rep,
      # Legacy aliases used by earlier configs/tests.
      "depth": predict_fn_sampling_depth,
      "panoptic": predict_fn_sampling_panoptic,
  }

  if cond_image is not None:
    def task_output_fn(train_state, batch, **kw):
      """Sample latents conditioned on the image, VAE-decode and argmax
      each categorical task head (UViM-with-GIVT inference)."""
      del kw
      raw = predict_fn_sampling(train_state, batch)["logits"]
      if not isinstance(raw, dict):
        return {"image": raw}
      out = {k: jnp.argmax(v, axis=-1) for k, v in raw.items()}
      if "depth" in raw and config.get("max_depth"):
        nbins = dict(config.vae.model)["inout_specs"]["depth"][1]
        out["depth"] = gutils.unbin_depth(
            raw["depth"], min_depth=config.min_depth,
            max_depth=config.max_depth, num_bins=nbins)
      return out

    predict_fns["task"] = task_output_fn

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
  u.write_note("Starting GIVT training loop...")
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
