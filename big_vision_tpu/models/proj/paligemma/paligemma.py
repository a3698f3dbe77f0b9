"""PaliGemma: SigLIP image tower + Gemma LLM with prefix-LM attention.

Parity target: reference models/proj/paligemma/paligemma.py (make_attn_mask
:27, embed_image_and_text :95, video frame folding, prefill/extend cache
delegation + slow fallback :179-239, two-part loader :273).
"""

from __future__ import annotations

import importlib
import os
from typing import Any, Optional

import einops
import flax.linen as nn
import jax
import jax.numpy as jnp

ConfigDict = Any


def _tower(family, cfg, name, **defaults):
  """Resolves a sub-model family name to a configured flax module."""
  mod = importlib.import_module(f"big_vision_tpu.models.{family}")
  return mod.Model(**{**defaults, **(cfg or {})}, name=name)


def make_attn_mask(input_mask, mask_ar):
  """bool[B, N, N] attention from a block-causal spec.

  mask_ar int[B, N] is 1 where previous tokens may NOT attend to this token
  (causal boundary) and 0 where the token shares its attention block with
  the previous token; a query may attend to every key whose block index is
  at most its own. input_mask False = padding (never attended, in either
  role).
  """
  block = jnp.cumsum(mask_ar, axis=1)
  visible = block[:, :, None] >= block[:, None, :]  # [b, q, k]
  live = jnp.logical_and(input_mask[:, :, None], input_mask[:, None, :])
  return visible & live


class Model(nn.Module):
  """Image tower + LLM."""
  img_model: str = "vit"
  img: Optional[ConfigDict] = None
  llm_model: str = "proj.paligemma.gemma_bv"
  llm: Optional[ConfigDict] = None

  def setup(self):
    # The LLM fixes the shared token width; the image tower projects into
    # it through its head (num_classes = embedding dim, overridable).
    self._llm = _tower(self.llm_model, self.llm, "llm")
    self._img_model = _tower(self.img_model, self.img, "img",
                             num_classes=self._llm.embdim)

  def embed_image(self, image, train=False):
    frames = image.shape[1] if image.ndim == 5 else None
    if frames:  # video: each frame goes through the tower independently...
      image = einops.rearrange(image, "b f h w c -> (b f) h w c")
    zimg, aux = self._img_model(image, train=train)
    if frames:  # ...and the per-frame tokens concatenate along the sequence.
      zimg = einops.rearrange(zimg, "(b f) n e -> b (f n) e", f=frames)
    return zimg, {"img/zimg": zimg,
                  **{f"img/{k}": v for k, v in aux.items()}}

  def embed_text(self, tokens, train=False):
    ztxt = self._llm.embed_tokens(tokens, train=train)
    return ztxt, {"llm/ztxt": ztxt}

  def embed_image_and_text(self, image, text, *, input_mask=None,
                           mask_ar=None, train=False):
    """(x [B,N,E], input_mask [B,N], mask_ar [B,N]), aux. Image tokens form
    a full-attention prefix (always live, mask_ar 0: they join the first
    text block); text follows with its caller-supplied masks."""
    zimg, img_aux = self.embed_image(image, train=train)
    ztxt, txt_aux = self.embed_text(text, train=train)

    if input_mask is None:
      input_mask = jnp.ones(text.shape, bool)
    if mask_ar is None:
      mask_ar = jnp.ones(text.shape, jnp.int32)

    n_img = zimg.shape[1]
    def with_prefix(fill, m):
      return jnp.concatenate(
          [jnp.full((m.shape[0], n_img), fill, m.dtype), m], axis=1)

    seq = jnp.concatenate([zimg, ztxt], axis=1)
    return ((seq, with_prefix(True, input_mask), with_prefix(0, mask_ar)),
            {**img_aux, **txt_aux})

  def __call__(self, image, text, mask_ar, train=False):
    """Returns float32[B, T, V] logits for the text tokens."""
    (seq, input_mask, mask_ar), out = self.embed_image_and_text(
        image, text, mask_ar=mask_ar, train=train)
    attn_mask = out["attn_mask"] = make_attn_mask(input_mask, mask_ar)
    # Segment ids carry the same prefix-LM mask for the fused flash
    # training path (used when the llm has attn_impl="flash").
    seg = jnp.where(input_mask, 1 + jnp.cumsum(mask_ar, axis=1), 0)
    _, llm_aux = self._llm(seq, mask=attn_mask, train=train, seg=seg)
    out.update({f"llm/{k}": v for k, v in llm_aux.items()})

    n_img = out["img/zimg"].shape[1]
    text_logits = self._llm.compute_logits(
        out["llm/pre_logits"][:, n_img:, :], train=train)
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
  def _cache(self, **updates):
    """Reads ("cache", k) for each kwarg; writes the non-None ones."""
    got = []
    for k, v in updates.items():
      if v is not None:
        self.put_variable("cache", k, v)
      got.append(self.get_variable("cache", k))
    return got

  def _last_live_logits(self, x, mask_ar, length):
    """Full forward over the growing sequence, read at position length-1."""
    live = jnp.arange(x.shape[1])[None, :] < length[:, None]
    logits, _ = self._llm(x, mask=make_attn_mask(live, mask_ar))
    return jnp.take_along_axis(logits, (length - 1)[:, None, None], axis=1)

  def _fallback_prefill_cache(self, x, input_mask, mask_ar, cache_size):
    length = jnp.sum(input_mask, axis=1)  # int[B], live prefix per example
    grow = [(0, 0), (0, cache_size - x.shape[1])]
    self._cache(
        x_cache=jnp.pad(jnp.where(input_mask[..., None], x, 0),
                        grow + [(0, 0)]),
        mask_ar_cache=jnp.pad(jnp.where(input_mask, mask_ar, 0), grow),
        length=length)
    return self._last_live_logits(*self._cache(x_cache=None,
                                               mask_ar_cache=None), length)

  def _fallback_extend_cache(self, x):
    assert x.shape[1] == 1
    cx, car, length = self._cache(x_cache=None, mask_ar_cache=None,
                                  length=None)
    # Append the token at each example's current length (generated tokens
    # are always causal: mask_ar = 1).
    at = lambda c, t, i: jax.lax.dynamic_update_slice(c, t, (i,) + (0,) * (c.ndim - 1))
    cx, car, length = self._cache(
        x_cache=jax.vmap(at)(cx, x, length),
        mask_ar_cache=jax.vmap(at)(car, jnp.ones((car.shape[0], 1), car.dtype),
                                   length),
        length=length + 1)
    return self._last_live_logits(cx, car, length)


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
  if isinstance(init_files, str):
    base = VANITY_NAMES.get(init_files, init_files)
    init_files = {part: f"{base}:{part}" for part in ("img", "llm")}
  init_files = {**init_files}
  cfg = dict(model_cfg)
  restored = {**(init_params or {"img": None, "llm": None})}

  parts = [("img", "vit", img_load_kw),
           ("llm", "proj.paligemma.gemma_bv", llm_load_kw)]
  for part, default_family, load_kw in parts:
    ckpt = init_files.pop(part, None)
    if ckpt is None:
      continue
    family = cfg.get(f"{part}_model", default_family)
    tower_mod = importlib.import_module(f"big_vision_tpu.models.{family}")
    restored[part] = tower_mod.load(
        restored[part], ckpt, cfg.get(part, {}), **(load_kw or {}))
  assert not init_files, f"Unused model_init entries: {init_files}"
  return restored
