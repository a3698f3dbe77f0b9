"""big_vision-style wrapper around the Gemma LM with a decode cache.

Parity target: reference models/proj/paligemma/gemma_bv.py. The key trick
is `_left_to_right_align` (:40): right-aligning the prompt makes the KV
cache write position identical across examples, so cache extension is one
dynamic_update_slice instead of a per-example scatter.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from big_vision_tpu.models.ppp import gemma


def _get_config(model):
  config = gemma.get_config(model.variant)
  config.scan = model.scan
  config.remat_policy = model.remat_policy
  if model.vocab_size is not None:
    config.vocab_size = model.vocab_size
  config.dropout = model.dropout
  config.dropout_bdims = model.dropout_bdims
  config.cache_dtype = model.cache_dtype
  if model.final_logits_softcap is not None:
    config.final_logits_softcap = model.final_logits_softcap
  if model.attn_logits_softcap is not None:
    config.attn_logits_softcap = model.attn_logits_softcap
  config.attn_impl = model.attn_impl
  config.quant = model.quant
  return config


@jax.vmap
def _left_to_right_align(x, input_mask, attn_mask):
  """Rolls one example so its valid tokens end at the sequence end."""
  assert x.ndim == 2 and input_mask.ndim == 1 and attn_mask.ndim == 2
  seqlen = jnp.sum(input_mask)
  x = jnp.roll(x, -seqlen, axis=0)
  input_mask = jnp.roll(input_mask, -seqlen, axis=0)
  attn_mask = jnp.roll(attn_mask, -seqlen, axis=(0, 1))
  return x, input_mask, attn_mask


class Model(nn.Module):
  """Gemma with the embed/compute_logits/prefill/extend protocol."""
  variant: str = "gemma_2b"
  scan: bool = True
  remat_policy: str = "nothing_saveable"
  vocab_size: Optional[int] = None
  dropout: float = 0.0
  dropout_bdims: Tuple[int, ...] = ()
  cache_dtype: Optional[str] = "bfloat16"
  final_logits_softcap: Optional[float] = None
  attn_logits_softcap: Optional[float] = None
  attn_impl: str = "xla"
  quant: bool = False

  def setup(self):
    # parent+name="" flattens the wrapper out of the params tree.
    self.model = gemma.Model(**_get_config(self), parent=self.scope, name="")

  def embed_tokens(self, tokens, train=False):
    return self.model(tokens, embed_only=True, deterministic=not train)

  def compute_logits(self, pre_logits, train=False):
    return self.model(None, pre_logits=pre_logits,
                      deterministic=not train)[0]

  def __call__(self, embs, mask=None, train=False, seg=None):
    batch_size, _, d_model = embs.shape
    assert d_model == self.embdim
    return self.model(
        tokens=jnp.zeros([batch_size, 0], dtype=jnp.int32),
        embedded_prefix=embs, mask=mask, deterministic=not train,
        seg=seg)

  def prefill_cache(self, x, input_mask, attn_mask, *, cache_size):
    """Fills the cache with a left-aligned prompt; returns last logits."""
    x, input_mask, attn_mask = _left_to_right_align(x, input_mask,
                                                    attn_mask)
    seq_len = jnp.sum(input_mask, axis=-1)
    self.put_variable("cache", "seq_len", seq_len)
    positions = jnp.cumsum(input_mask, axis=-1) - 1

    batch_size, prefill_len, _ = x.shape
    self.put_variable("cache", "cache_begin", prefill_len - seq_len)
    self.put_variable("cache", "cache_end",
                      jnp.full((batch_size,), prefill_len, jnp.int32))

    mask = jnp.pad(attn_mask,
                   ((0, 0), (0, 0), (0, cache_size - prefill_len)))
    _, aux = self.model(tokens=None, embedded_prefix=x,
                        positions=positions, mask=mask, decode=True)
    return self.compute_logits(aux["pre_logits"][:, -1:])

  def extend_cache(self, x):
    """One-token cache extension; returns [B, 1, V] logits."""
    assert x.shape[1] == 1, "extend_cache is one token at a time"
    # Cache layout is [..., cache_size, heads, head_dim] in BOTH layer
    # layouts (scan: [L, B, S, H, D]; per-layer pyloop: [B, S, H, D]),
    # so shape[-3] reads the cache size regardless of self.model.scan
    # (reference supports both: gemma_bv.py:40 + gemma.py:161-195).
    from flax import traverse_util
    k_caches = [v for path, v in
                traverse_util.flatten_dict(self.variables["cache"]).items()
                if path[-1] == "k_cache"]
    assert k_caches, "extend_cache called before prefill_cache"
    cache_size = k_caches[0].shape[-3]

    positions = self.get_variable("cache", "seq_len")
    self.put_variable("cache", "seq_len", positions + 1)

    cache_begin = self.get_variable("cache", "cache_begin")
    cache_end = self.get_variable("cache", "cache_end") + 1
    self.put_variable("cache", "cache_end", cache_end)
    mask = jnp.logical_and(
        jnp.arange(cache_size)[None, None, :] >= cache_begin[:, None, None],
        jnp.arange(cache_size)[None, None, :] < cache_end[:, None, None])

    logits, _ = self.model(tokens=None, embedded_prefix=x,
                           positions=positions[:, None], mask=mask,
                           decode=True)
    return logits

  @property
  def embdim(self):
    return _get_config(self).width


load = gemma.load
