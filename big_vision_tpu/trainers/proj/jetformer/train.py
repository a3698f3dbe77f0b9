"""JetFormer trainer: joint image+text NLL with an invertible Jet adaptor.

Parity target: reference trainers/proj/jetformer/train.py. Per step:
  * patch-PCA encodes images to latents (+ optional dequant noise),
  * the Jet flow ("adaptor") maps latents to soft tokens, contributing its
    log-determinant to the image likelihood (the flow is TRAINED here,
    unlike GIVT's frozen VAE),
  * optionally the last `latent_noise_dim` channels are factored out
    against a standard-normal prior,
  * the transformer models text NLL (categorical) + image NLL (GMM) for a
    per-example random [text, image] / [image, text] order, with optional
    CFG label dropping and an RGB-noise cosine curriculum.

Losses are reported in bits/subpixel for images (incl. logdet and the
[0,255]->[-1,1] change of variables), nats/token for text.

The update step is one jitted SPMD program over the mesh; EMA params are
updated inside it when `ema_decay > 0`.
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
import big_vision_tpu.trainers.proj.jetformer.predict_fns as predict_fns
import big_vision_tpu.utils as u

NamedSharding = jax.sharding.NamedSharding
P = jax.sharding.PartitionSpec

LOG2 = np.log(2)


def _quantized_noise(images, noise_scale, rng):
  """RGB-noise curriculum: noise as if added to the uint8 pixels."""
  u8 = jnp.round((images + 1) * 127.5)
  u8 += noise_scale * jax.random.normal(rng, u8.shape)
  return jnp.round(u8) / 127.5 - 1


def _cosine_noise_schedule(config, progress):
  """Cosine-annealed RGB noise scale, or None when disabled."""
  top = config.get("noise_scale", 0.0)
  if not top > 0.0:
    return None
  floor = config.get("noise_min", 0.0)
  return floor + (top - floor) * 0.5 * (1 + jnp.cos(jnp.pi * progress))


def _batch_masked_mean(batch):
  """mean() respecting both a per-example condition and batch["_mask"]."""
  def mean(x, where=None):
    if (vm := batch.get("_mask")) is not None:
      vm = vm.astype(bool)
      where = vm if where is None else (where & vm)
    return jnp.mean(x, where=where)
  return mean


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

  for m in config.get("pp_modules", ["ops_general", "ops_image",
                                     "ops_text"]):
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
  get_steps = functools.partial(u.steps, config=config, data_size=ntrain_img,
                                batch_size=batch_size,
                                total_steps=total_steps)

  chrono.inform(first_step=0, total_steps=total_steps, global_bs=batch_size,
                steps_per_epoch=ntrain_img / batch_size)

  # ------------------------------------------------------------------
  # Models: parameter-free patch-PCA tokenizer, transformer, Jet flow.
  # ------------------------------------------------------------------

  assert config.patch_pca.model_name == "proj.jetformer.patch_pca", (
      "JetFormer uses proj.jetformer.patch_pca as the embedder.")

  def build(name, **kw):
    mod = importlib.import_module(f"big_vision_tpu.models.{name}")
    return mod, mod.Model(**kw)

  _, patch_pca = build(config.patch_pca.model_name,
                       **config.patch_pca.get("model", {}))
  model_mod, model = build(config.model_name, **config.get("model", {}))
  adaptor = None
  if config.get("adaptor_name"):
    adaptor = build(config.adaptor_name, **config.adaptor.model)[1]

  def patch_pca_encode(images, rng=None, reparametrize=True):
    stats = patch_pca.apply({"params": {}}, images,
                            method=patch_pca.encode, rngs=rng)
    if not reparametrize:
      return stats[0]  # mu
    assert rng is not None and "dropout" in rng
    return patch_pca.apply({"params": {}}, *stats,
                           method=patch_pca.reparametrize, rngs=rng)

  def adaptor_apply(params, seq, inverse=False):
    direction = adaptor.inverse if inverse else adaptor.forward
    seq, sum_log_det = adaptor.apply(
        {"params": params}, predict_fns.unflatten_latents(seq),
        method=direction)
    return predict_fns.flatten_latents(seq), sum_log_det

  noise_dim = config.get("latent_noise_dim", 0)

  def _strip_noise_dims(image_tokens):
    if noise_dim > 0:
      image_tokens = image_tokens[..., :-noise_dim]
      assert image_tokens.shape[-1] == model.out_dim
    return image_tokens

  img_shape, txt_shape = config.init_shapes[:2]

  def init(rng):
    images = jnp.zeros(img_shape, jnp.float32)
    text = jnp.zeros(txt_shape, jnp.int32)
    image_tokens = patch_pca_encode(images, rng={"dropout": rng})
    params_adaptor = {}
    if adaptor is not None:
      rng, rng_adaptor = jax.random.split(rng)
      seq = predict_fns.unflatten_latents(image_tokens)
      (seq, _), adaptor_vars = adaptor.init_with_output(
          rng_adaptor, seq, method=adaptor.forward)
      params_adaptor = adaptor_vars["params"]
      image_tokens = predict_fns.flatten_latents(seq)
    image_tokens = _strip_noise_dims(image_tokens)
    text_first = jnp.full((images.shape[0],), False)
    params = dict(model.init(rng, text, image_tokens,
                             text_first_mask=text_first)["params"])
    params["params_adaptor"] = params_adaptor
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
  ema_decay = config.get("ema_decay", 0.0)
  if ema_decay > 0.0:
    train_state_sharding["params_ema"] = params_sharding

  with jax.transfer_guard("allow"):
    rng_init = u.reshard(rng_init, repl_sharding)
  params = nn.unbox(
      jax.jit(init, out_shardings=params_sharding)(rng_init))
  opt = jax.jit(tx.init, out_shardings=opt_sharding)(params)
  train_state = {"params": params, "opt": opt}
  if ema_decay > 0.0:
    train_state["params_ema"] = jax.tree.map(jnp.array, params)
  del params, opt

  rng, rng_loop = jax.random.split(rng)
  with jax.transfer_guard("allow"):
    rng_loop = u.reshard(rng_loop, repl_sharding)

  # ------------------------------------------------------------------
  # Loss (ref trainers/proj/jetformer/train.py:345).
  # ------------------------------------------------------------------

  def loss_fn(params, batch, rng, noise_scale=None, train=True):
    images = batch["image"]
    text = batch["text"]
    bs = len(images)
    text_mask = batch.get("text_mask")
    if text_mask is not None:
      text_mask = text_mask.astype(bool)
    text_loss = batch.get("text_loss", jnp.ones(text.shape, bool))
    text_loss = text_loss.astype(bool)

    keys = jax.random.split(rng, 5)
    rng, rng_order, rng_droplabels, rng_noise = keys[:4]
    rng_dropout = {"dropout": keys[4]}
    text_first_mask = jax.random.bernoulli(
        rng_order, config.get("text_prefix_prob", 0.5), (bs,))

    if noise_scale is not None:
      if not config.get("rgb_noise_on_image_prefix", True):
        # Only noise examples whose image is the SUFFIX (text-first).
        noise_scale = jnp.where(text_first_mask, noise_scale,
                                0.0)[:, None, None, None]
      images = _quantized_noise(images, noise_scale, rng_noise)

    # Image pixels -> flow tokens, tracking the flow's log-determinant.
    image_tokens = patch_pca_encode(images, rng_dropout)
    sum_log_det = jnp.zeros((bs,))
    if adaptor is not None:
      image_tokens, sum_log_det = adaptor_apply(
          params["params_adaptor"], image_tokens)

    noise_nll = 0.0
    if noise_dim > 0:
      # Factor the last channels out against a standard-normal prior.
      assert model.out_dim + noise_dim == image_tokens.shape[-1]
      image_tokens, factored = jnp.split(image_tokens, [model.out_dim], -1)
      noise_nll = 0.5 * jnp.sum(factored ** 2 + jnp.log(2 * jnp.pi),
                                axis=(1, 2))

    if train and (in_std := config.get("input_noise_std", 0.0)) > 0.0:
      # Teacher-forcing input noise for sampling robustness.
      _, rng_std, rng_in = jax.random.split(rng, 3)
      std = jax.random.uniform(rng_std, (bs, 1, 1), minval=0.0,
                               maxval=in_std)
      std = jnp.where(text_first_mask[:, None, None], std, 0.0)
      image_tokens += std * jax.random.normal(rng_in, image_tokens.shape)

    drop_prefix = (model.get_drop_labels(rng_droplabels, batch_size=bs)
                   if train else None)
    if drop_prefix is None:
      drop_prefix = jnp.full((bs,), False)
    drop_prefix &= text_first_mask

    if config.get("stop_grad_nvp_prefix", False):
      # The flow acts as a frozen encoder when the image is the prefix.
      frozen = jax.lax.stop_gradient(image_tokens)
      keep_grads = text_first_mask[:, None, None]
      image_tokens = jnp.where(keep_grads, image_tokens, frozen)

    *_, pmf, pdf, _ = model.apply(
        {"params": params}, text, image_tokens, train=train,
        text_first_mask=text_first_mask, text_input_mask=text_mask,
        drop_prefix=drop_prefix, rngs=rng_dropout)

    nll_txt = jnp.mean(-pmf.log_prob(text), axis=1, where=text_loss)

    # Image NLL in bits/subpixel, incl. flow logdet and the /127.5 rescale.
    num_subpixels = np.prod(images.shape[1:])
    nll_img_tok = (jnp.sum(-pdf.log_prob(image_tokens), axis=1)
                   + noise_nll) / num_subpixels / LOG2
    logdet = (sum_log_det / num_subpixels - jnp.log(127.5)) / LOG2
    nll_image = nll_img_tok - logdet

    mean = _batch_masked_mean(batch)
    # Per-order breakdown; "prefix" rows exclude CFG-dropped prefixes.
    breakdown = (
        ("nll_text_prefix", nll_txt, text_first_mask & ~drop_prefix),
        ("nll_text_suffix", nll_txt, ~text_first_mask),
        ("nll_image_prefix", nll_image, ~text_first_mask & ~drop_prefix),
        ("nll_image_suffix", nll_image, text_first_mask),
    )
    metrics = {k: mean(v, where=w) for k, v, w in breakdown}

    text_w = config.get("text_loss_weight", 1.0)
    if config.get("loss_on_prefix", True):
      # Both orders contribute; CFG-dropped prefixes contribute nothing.
      valid_txt = ~text_first_mask | (text_first_mask & ~drop_prefix)
      valid_img = text_first_mask | (~text_first_mask & ~drop_prefix)
      metrics["nll_text"] = mean(nll_txt, where=valid_txt)
      metrics["nll_image"] = mean(nll_image, where=valid_img)
      metrics["logdet"] = mean(logdet)
      loss = metrics["nll_text"] * text_w + metrics["nll_image"]
    else:
      # Suffix-only training: each example contributes its suffix NLL.
      metrics["nll_text"] = mean(nll_txt, where=~text_first_mask)
      metrics["nll_image"] = mean(nll_image, where=text_first_mask)
      metrics["nll_image_tokens"] = mean(nll_img_tok,
                                         where=text_first_mask)
      metrics["logdet"] = mean(logdet, where=text_first_mask)
      loss = mean(jnp.where(~text_first_mask, nll_txt * text_w, nll_image))

    metrics["loss"] = loss
    return loss, metrics

  # ------------------------------------------------------------------
  # One jitted SPMD update.
  # ------------------------------------------------------------------

  update_jit_kw = dict(donate_argnums=(0,),
                       out_shardings=(train_state_sharding, repl_sharding))

  @functools.partial(jax.jit, **update_jit_kw)
  def update_fn(train_state, rng, batch):
    measurements = {}
    step_count = bv_optim.get_count(train_state["opt"], jittable=True)
    rng = jax.random.fold_in(rng, step_count)
    noise_scale = _cosine_noise_schedule(config,
                                         step_count / total_steps)
    if noise_scale is not None:
      measurements["noise_scale"] = noise_scale

    _, rng_model = jax.random.split(rng)
    params, opt = train_state["params"], train_state["opt"]
    grad_fn = jax.value_and_grad(
        lambda p: loss_fn(p, batch, rng_model, noise_scale=noise_scale),
        has_aux=True)
    (loss, metrics), grads = grad_fn(params)
    updates, opt = tx.update(grads, opt, params)
    new_train_state = {"params": optax.apply_updates(params, updates),
                       "opt": opt}
    params = new_train_state["params"]
    if ema_decay > 0.0:
      def ema_step(prev, new):
        return ema_decay * prev + (1 - ema_decay) * new
      new_train_state["params_ema"] = jax.tree.map(
          ema_step, train_state["params_ema"], params)

    measurements["training_loss"] = loss
    gs = jax.tree.leaves(bv_optim.replace_frozen(config.schedule, grads, 0.))
    measurements["l2_grads"] = jnp.sqrt(sum(jnp.vdot(g, g) for g in gs))
    measurements["l2_params"] = optax.global_norm(params)
    if adaptor is not None:
      measurements["l2_params_adaptor"] = optax.global_norm(
          params["params_adaptor"])
    measurements.update({f"train/{k}": jnp.mean(v)
                         for k, v in metrics.items()})
    return new_train_state, measurements

  # ------------------------------------------------------------------
  # Checkpointing / resume.
  # ------------------------------------------------------------------

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

  # ------------------------------------------------------------------
  # Predict fns for evaluators.
  # ------------------------------------------------------------------

  def validation_fn(train_state, batch, *, use_ema=False):
    params = train_state["params_ema" if use_ema else "params"]
    _, aux = loss_fn(params, batch, jax.random.PRNGKey(0), train=False)
    per_example = batch["text"].shape[:1]
    return jax.tree.map(lambda x: jnp.broadcast_to(x, per_example), aux)

  def sample_images_fn(train_state, batch, *, decode_len=None,
                       use_ema=False):
    params = train_state["params_ema" if use_ema else "params"]
    sic = config.get("sample_images", {})
    text = batch["text"]
    batch = {**batch,
             "text": text if text.ndim >= 2 else text[:, None]}
    out = predict_fns.sample_image_latents(
        params, batch, model=model,
        decode_len=decode_len or config.get("decode_len", 256),
        cfg_weight=sic.get("cfg_inference_weight", 0.0),
        temperature=sic.get("temperature", 1.0),
        temperature_probs=sic.get("temperature_probs", 1.0))
    image_tokens = out["out_tokens"]
    if noise_dim > 0:
      # Sampled latents get fresh factored-out noise channels.
      tail = jax.random.normal(jax.random.PRNGKey(0),
                               image_tokens.shape[:-1] + (noise_dim,))
      image_tokens = jnp.concatenate([image_tokens, tail], axis=-1)
    images = predict_fns.decode_images(
        params.get("params_adaptor", {}), image_tokens,
        adaptor=adaptor, patch_pca=patch_pca)
    return {"images": images, "logp": out["out_logp"]}

  predict_fns_dict = {"validation": validation_fn,
                      "sample_images": sample_images_fn}

  @functools.cache
  def evaluators():
    return eval_common.from_config(
        config, predict_fns_dict, write_note=u.write_note,
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
  u.write_note("Starting JetFormer training loop...")
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
