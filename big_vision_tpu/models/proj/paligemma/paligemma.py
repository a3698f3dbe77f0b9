"""PaliGemma: SigLIP image tower + Gemma LLM with prefix-LM attention.

Parity target: reference models/proj/paligemma/paligemma.py (make_attn_mask
:27, embed_image_and_text :95, video frame folding, prefill/extend cache
delegation + slow fallback :179-239, two-part loader :273).
"""

from __future__ import annotations

import importlib
import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

ConfigDict = Any


def make_attn_mask(input_mask, mask_ar):
  """bool[B, N, N] attention from a block-causal spec.

  mask_ar int[B, N] is 1 where previous tokens may NOT attend to this token
  (causal boundary) and 0 where the token shares its attention block with
  the previous token. input_mask False = padding.
  """
  cumsum = jnp.cumsum(mask_ar, axis=1)
  attn_mask = cumsum[:, None, :] <= cumsum[:, :, None]
  valid_mask = input_mask[:, None, :] * input_mask[:, :, None]
  return jnp.logical_and(attn_mask, valid_mask)


class Model(nn.Module):
  """Image tower + LLM."""
  img_model: str = "vit"
  img: Optional[ConfigDict] = None
  llm_model: str = "proj.paligemma.gemma_bv"
  llm: Optional[ConfigDict] = None

  def setup(self):
    self._llm = importlib.import_module(
        f"big_vision_tpu.models.{self.llm_model}"
    ).Model(**(self.llm or {}), name="llm")
    img_config = {"num_classes": self._llm.embdim, **(self.img or {})}
    self._img_model = importlib.import_module(
        f"big_vision_tpu.models.{self.img_model}"
    ).Model(**img_config, name="img")

  def embed_image(self, image, train=False):
    out = {}
    image_shape = image.shape
    if len(image_shape) == 5:  # video: fold frames into batch
      image = jnp.reshape(image, (-1, *image.shape[-3:]))
    zimg, out_img = self._img_model(image, train=train)
    if len(image_shape) == 5:  # concat tokens from all frames
      zimg = jnp.reshape(zimg, (image_shape[0], -1, zimg.shape[-1]))
    out["img/zimg"] = zimg
    for k, v in out_img.items():
      out[f"img/{k}"] = v
    return zimg, out

  def embed_text(self, tokens, train=False):
    out = {}
    ztxt = out["llm/ztxt"] = self._llm.embed_tokens(tokens, train=train)
    return ztxt, out

  def embed_image_and_text(self, image, text, *, input_mask=None,
                           mask_ar=None, train=False):
    """(x [B,N,E], input_mask [B,N], mask_ar [B,N]), aux. Image is the
    full-attention prefix; text follows."""
    zimg, out_img = self.embed_image(image, train=train)
    ztxt, out_txt = self.embed_text(text, train=train)

    if input_mask is None:
      input_mask = jnp.full(text.shape, True)
    if mask_ar is None:
      mask_ar = jnp.full(text.shape, 1)

    x = jnp.concatenate([zimg, ztxt], axis=1)
    img_len = zimg.shape[1]
    pad_width = ((0, 0), (img_len, 0))
    mask_ar = jnp.pad(mask_ar, pad_width, constant_values=0)
    input_mask = jnp.pad(input_mask, pad_width, constant_values=True)
    return (x, input_mask, mask_ar), {**out_img, **out_txt}

  def __call__(self, image, text, mask_ar, train=False):
    """Returns float32[B, T, V] logits for the text tokens."""
    (x, input_mask, mask_ar), out = self.embed_image_and_text(
        image, text, mask_ar=mask_ar, train=train)
    attn_mask = out["attn_mask"] = make_attn_mask(input_mask, mask_ar)
    # Segment ids carry the same prefix-LM mask for the fused flash
    # training path (used when the llm has attn_impl="flash").
    seg = jnp.where(input_mask, jnp.cumsum(mask_ar, axis=1) + 1, 0)
    _, out_llm = self._llm(x, mask=attn_mask, train=train, seg=seg)
    for k, v in out_llm.items():
      out[f"llm/{k}"] = v

    zimg = out["img/zimg"]
    text_pre_logits = out["llm/pre_logits"][:, zimg.shape[1]:, :]
    text_logits = self._llm.compute_logits(text_pre_logits, train=train)
    out["text_logits"] = text_logits
    out["text_tokens"] = jnp.argmax(text_logits, axis=-1)
    return text_logits, out

  def prefill_cache(self, x, input_mask, mask_ar, *, cache_size):
    if hasattr(self._llm, "prefill_cache"):
      attn_mask = make_attn_mask(input_mask, mask_ar)
      return self._llm.prefill_cache(x, input_mask, attn_mask,
                                     cache_size=cache_size)
    return self._fallback_prefill_cache(x, input_mask, mask_ar, cache_size)

  def extend_cache(self, x):
    if hasattr(self._llm, "prefill_cache"):
      return self._llm.extend_cache(x)
    return self._fallback_extend_cache(x)

  # Decode-correctness oracle, derived from the property it checks: the
  # logit for a new token must equal a FULL prefix-LM forward over the
  # growing sequence, read at the last live position. The cache therefore
  # stores the raw embedded sequence plus a per-example length vector;
  # each step writes one slot (dynamic_update_slice at length) and
  # recomputes everything — O(T^2) per token, tests/debugging only.
  # Tests diff the fast right-aligned KV path against this at every step.
  def _fallback_prefill_cache(self, x, input_mask, mask_ar, cache_size):
    logits, _ = self._llm(x, mask=make_attn_mask(input_mask, mask_ar))
    length = jnp.sum(input_mask, axis=1)  # int[B], live prefix per example
    grow = [(0, 0), (0, cache_size - x.shape[1])]
    self.put_variable("cache", "x_cache",
                      jnp.pad(jnp.where(input_mask[..., None], x, 0),
                              grow + [(0, 0)]))
    self.put_variable("cache", "mask_ar_cache",
                      jnp.pad(jnp.where(input_mask, mask_ar, 0), grow))
    self.put_variable("cache", "length", length)
    return jnp.take_along_axis(logits, (length - 1)[:, None, None], axis=1)

  def _fallback_extend_cache(self, x):
    assert x.shape[1] == 1
    cx = self.get_variable("cache", "x_cache")
    car = self.get_variable("cache", "mask_ar_cache")
    length = self.get_variable("cache", "length")

    # Append the token at each example's current length (generated tokens
    # are always causal: mask_ar = 1).
    cx = jax.vmap(
        lambda c, t, i: jax.lax.dynamic_update_slice(c, t, (i, 0)))(
            cx, x, length)
    car = jax.vmap(
        lambda c, i: jax.lax.dynamic_update_slice(
            c, jnp.ones((1,), c.dtype), (i,)))(car, length)
    length = length + 1
    self.put_variable("cache", "x_cache", cx)
    self.put_variable("cache", "mask_ar_cache", car)
    self.put_variable("cache", "length", length)

    live = jnp.arange(cx.shape[1])[None, :] < length[:, None]
    logits, _ = self._llm(cx, mask=make_attn_mask(live, car))
    return jnp.take_along_axis(logits, (length - 1)[:, None, None], axis=1)


GEMMA_DIR = os.environ.get("BV_GEMMA_DIR", "PLEASE_SET_BV_GEMMA_DIR")
VANITY_NAMES = {
    name: os.path.join(GEMMA_DIR, fname) for name, fname in {
        "pt_224": "pt_224.npz", "pt_224.bf16": "pt_224.bf16.npz",
        "pt_448": "pt_448.npz", "pt_448.bf16": "pt_448.bf16.npz",
        "pt_896": "pt_896.npz", "pt_896.bf16": "pt_896.bf16.npz",
        "pt_3b_224": "pt_3b_224.bf16.npz",
        "pt_3b_448": "pt_3b_448.bf16.npz",
        "pt_10b_224": "pt_10b_224.bf16.npz",
    }.items()
}


def load(init_params, init_files, model_cfg, img_load_kw=None,
         llm_load_kw=None):
  """Two-part loader: img and llm sub-checkpoints (or one combined npz)."""
  img_load_kw = img_load_kw or {}
  llm_load_kw = llm_load_kw or {}
  if isinstance(init_files, str):
    init_files = VANITY_NAMES.get(init_files, init_files)
    init_files = {"img": f"{init_files}:img", "llm": f"{init_files}:llm"}
  if not init_params:
    init_params = {"img": None, "llm": None}
  restored = {**init_params}
  init_files = {**init_files}

  if img_init := init_files.pop("img", None):
    restored["img"] = importlib.import_module(
        "big_vision_tpu.models."
        + dict(model_cfg).get("img_model", "vit")
    ).load(init_params["img"], img_init, dict(model_cfg).get("img", {}),
           **img_load_kw)
  if llm_init := init_files.pop("llm", None):
    restored["llm"] = importlib.import_module(
        "big_vision_tpu.models."
        + dict(model_cfg).get("llm_model", "proj.paligemma.gemma_bv")
    ).load(init_params["llm"], llm_init, dict(model_cfg).get("llm", {}),
           **llm_load_kw)
  assert not init_files, f"Unused model_init entries: {init_files}"
  return restored
