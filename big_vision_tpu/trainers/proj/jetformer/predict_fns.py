"""JetFormer prediction: latent <-> image codecs and AR sampling.

Parity target: reference trainers/proj/jetformer/predict_fns.py. The
reference samples with an nn.scan whose carry is the flax cache; here the
whole decode (prefill + per-token loop) is one `lax.fori_loop` inside a
single jitted program, threading the cache dict explicitly (same pattern
as models/proj/givt/decode.py and paligemma/predict_fns.py) — no Python
per-token dispatch, no host sync until the samples are fetched.
"""

from __future__ import annotations

import einops
import flax.linen as nn
import jax
import jax.numpy as jnp

from big_vision_tpu.models.proj.givt import distributions


# ---------------------------------------------------------------------------
# Latent <-> image codecs.
# ---------------------------------------------------------------------------


def unflatten_latents(x):
  hw = int(x.shape[1] ** 0.5)
  return einops.rearrange(x, "b (h w) c -> b h w c", h=hw, w=hw)


def flatten_latents(x):
  return einops.rearrange(x, "b h w c -> b (h w) c")


def encode_images(params, images, *, adaptor, patch_pca, rngs,
                  reparametrize):
  """images -> soft tokens: patch-PCA then the invertible adaptor."""
  x, logvar = patch_pca.apply({"params": {}}, images,
                              method=patch_pca.encode, rngs=rngs)
  if reparametrize:
    x = patch_pca.apply({"params": {}}, x, logvar,
                        method=patch_pca.reparametrize, rngs=rngs)
  if adaptor is not None:
    x = unflatten_latents(x)
    x, _ = adaptor.apply({"params": params}, x, method=adaptor.forward)
    x = flatten_latents(x)
  return x


def decode_images(params, x, *, adaptor, patch_pca):
  """soft tokens -> images: inverse adaptor then PCA inverse transform."""
  if adaptor is not None:
    x = unflatten_latents(x)
    x, _ = adaptor.apply({"params": params}, x, method=adaptor.inverse)
    x = flatten_latents(x)
  return patch_pca.apply({"params": {}}, x, method=patch_pca.decode)


# ---------------------------------------------------------------------------
# Sampling helpers.
# ---------------------------------------------------------------------------


def _gmm_cfg_sample(model, logits_c, logits_u, rng, *, cfg_weight,
                    temperature, temperature_probs):
  """Samples guided soft tokens from (cond, uncond) GMM head outputs."""
  pdf_c = model.get_pdf(logits_c, temperature_scales=temperature,
                        temperature_probs=temperature_probs)
  pdf_u = model.get_pdf(logits_u, temperature_scales=temperature,
                        temperature_probs=temperature_probs)
  k_comp, k_chan = jax.random.split(rng)
  # Pick the mixture component from the conditional mixture, then guide the
  # per-channel Gaussians (reference CFGDensity, parallel_decode.py:264).
  comp = jax.random.categorical(k_comp, pdf_c.logits, axis=-1)
  def pick(locs, scales):
    loc = jnp.take_along_axis(locs, comp[..., None, None], axis=-2)[..., 0, :]
    sc = jnp.take_along_axis(scales, comp[..., None, None],
                             axis=-2)[..., 0, :]
    return loc, sc
  loc_c, scale_c = pick(pdf_c.locs, pdf_c.scales)
  loc_u, scale_u = pick(pdf_u.locs, pdf_u.scales)
  cfg = distributions.GaussianCFG(loc_c, scale_c, loc_u, scale_u,
                                  w=cfg_weight)
  samples = cfg.sample(k_chan)
  logp = jnp.sum(cfg.log_prob(samples), axis=-1)  # [B, N, C] -> [B, N]
  return samples, logp


def sample_image_latents(params, batch, *, model, decode_len=256,
                         temperature=1.0, temperature_probs=1.0,
                         cfg_weight=None, rng=None):
  """Samples image soft tokens conditioned on a text prompt.

  Returns {"out_tokens": [B, decode_len, D], "out_logp": [B, decode_len]}.
  """
  if rng is None:
    rng = jax.random.PRNGKey(0)
  do_cfg = ((cfg_weight != 0) if isinstance(cfg_weight, (int, float))
            else cfg_weight is not None)

  text = batch["text"]
  text_mask = batch.get("text_mask")
  if text_mask is None:
    text_mask = jnp.full(text.shape, True)

  if do_cfg:
    drop_prefix = jnp.tile(jnp.array([False, True]), text.shape[0])
    text = jnp.repeat(text, 2, axis=0)
    text_mask = jnp.repeat(text_mask, 2, axis=0)
  else:
    drop_prefix = None

  batch_size = text.shape[0]
  images0 = jnp.zeros((batch_size, 0, model.out_dim))
  text_first = jnp.full((batch_size,), True)

  variables = {"params": params}

  def embed(m):
    return m.embed_image_and_text(
        text, images0, text_first_mask=text_first,
        text_input_mask=text_mask, drop_prefix=drop_prefix, shift=False)
  x, attn_mask, input_mask = nn.apply(embed, model)(variables)

  cache_size = x.shape[1] + decode_len - 1
  prelogits, aux = model.apply(
      variables, x, attn_mask, input_mask, cache_size=cache_size,
      method=model.prefill_cache, mutable=["cache"])
  cache = aux["cache"]
  last_prelogits = prelogits[:, -1:]

  def img_logits(prelogits):
    return nn.apply(lambda m, p: m.img_logits(p), model)(variables,
                                                         prelogits)

  def sample_tokens(prelogits, step_rng):
    logits = img_logits(prelogits)
    if do_cfg:
      logits_c, logits_u = logits[0::2], logits[1::2]
      tokens, logp = _gmm_cfg_sample(
          model, logits_c, logits_u, step_rng, cfg_weight=cfg_weight,
          temperature=temperature, temperature_probs=temperature_probs)
      return (jnp.repeat(tokens, 2, axis=0), jnp.repeat(logp, 2, axis=0))
    pdf = model.get_pdf(logits, temperature_scales=temperature,
                        temperature_probs=temperature_probs)
    tokens = pdf.sample(seed=step_rng)
    return tokens, pdf.log_prob(tokens)

  rngs = jax.random.split(rng, decode_len)
  tok0, logp0 = sample_tokens(last_prelogits, rngs[0])

  out_tokens = jnp.zeros((batch_size, decode_len, model.out_dim))
  out_logp = jnp.zeros((batch_size, decode_len))
  out_tokens = out_tokens.at[:, 0:1].set(tok0)
  out_logp = out_logp.at[:, 0:1].set(logp0)

  def body(i, carry):
    cache, last_tokens, out_tokens, out_logp = carry
    emb = nn.apply(lambda m, t: m.img_emb(t), model)(variables, last_tokens)
    prelogits, aux = model.apply(
        {**variables, "cache": cache}, emb, method=model.extend_cache,
        mutable=["cache"])
    cache = aux["cache"]
    tokens, logp = sample_tokens(prelogits, rngs[i])
    out_tokens = jax.lax.dynamic_update_slice(out_tokens, tokens, (0, i, 0))
    out_logp = jax.lax.dynamic_update_slice(out_logp, logp, (0, i))
    return cache, tokens, out_tokens, out_logp

  _, _, out_tokens, out_logp = jax.lax.fori_loop(
      1, decode_len, body, (cache, tok0, out_tokens, out_logp))

  out = {"out_tokens": out_tokens, "out_logp": out_logp}
  if do_cfg:
    out = jax.tree.map(lambda x: x[0::2], out)
  return out


def sample_text(params, batch, *, model, decode_len=64, temperature=1.0,
                rng=None):
  """Samples text tokens conditioned on image soft tokens.

  batch: {"image_latents": [B, N, D], optional "text"/"text_mask" prompt}.
  Returns {"out_tokens": [B, decode_len] int32, "out_logp": ...}.
  """
  if rng is None:
    rng = jax.random.PRNGKey(0)
  images = batch["image_latents"]
  batch_size = images.shape[0]
  text_first = jnp.full((batch_size,), False)

  if batch.get("text") is None:
    text = jnp.full((batch_size, 0), 0, jnp.int32)
    text_mask = jnp.full((batch_size, 0), True)
  else:
    text = batch["text"]
    text_mask = batch.get("text_mask", jnp.full(text.shape, True))

  variables = {"params": params}

  def embed(m):
    return m.embed_image_and_text(
        text, images, text_first_mask=text_first,
        text_input_mask=text_mask, shift=False)
  x, attn_mask, input_mask = nn.apply(embed, model)(variables)

  cache_size = x.shape[1] + decode_len - 1
  prelogits, aux = model.apply(
      variables, x, attn_mask, input_mask, cache_size=cache_size,
      method=model.prefill_cache, mutable=["cache"])
  cache = aux["cache"]

  def sample_tokens(prelogits, step_rng):
    logits = nn.apply(lambda m, p: m.text_logits(p), model)(variables,
                                                            prelogits)
    samples = model.get_pmf(logits / temperature).sample(seed=step_rng)
    logp = model.get_pmf(logits).log_prob(samples)
    return samples, logp

  rngs = jax.random.split(rng, decode_len)
  tok0, logp0 = sample_tokens(prelogits[:, -1:], rngs[0])

  out_tokens = jnp.zeros((batch_size, decode_len), tok0.dtype)
  out_logp = jnp.zeros((batch_size, decode_len))
  out_tokens = out_tokens.at[:, 0:1].set(tok0)
  out_logp = out_logp.at[:, 0:1].set(logp0)

  def body(i, carry):
    cache, last_tokens, out_tokens, out_logp = carry
    emb = nn.apply(lambda m, t: m.text_emb(t), model)(variables,
                                                      last_tokens)
    prelogits, aux = model.apply(
        {**variables, "cache": cache}, emb, method=model.extend_cache,
        mutable=["cache"])
    cache = aux["cache"]
    tokens, logp = sample_tokens(prelogits, rngs[i])
    out_tokens = jax.lax.dynamic_update_slice(out_tokens, tokens, (0, i))
    out_logp = jax.lax.dynamic_update_slice(out_logp, logp, (0, i))
    return cache, tokens, out_tokens, out_logp

  _, _, out_tokens, out_logp = jax.lax.fori_loop(
      1, decode_len, body, (cache, tok0, out_tokens, out_logp))
  return {"out_tokens": out_tokens, "out_logp": out_logp}
