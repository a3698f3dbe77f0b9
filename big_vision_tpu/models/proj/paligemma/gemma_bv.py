"""big_vision-style wrapper around the Gemma LM with a decode cache.

Behavior parity: reference models/proj/paligemma/gemma_bv.py. The protocol
is embed_tokens / compute_logits / __call__ / prefill_cache / extend_cache.

The core trick (kept from the reference design, re-derived here without
vmap): right-align every prompt so all examples end at the same cache slot.
Cache extension then becomes a single dynamic_update_slice at a shared,
statically-advancing position instead of a per-example scatter — the
difference between one fused TPU op per token and a gather/scatter chain.
Alignment itself is a batched modular gather (take_along_axis), which XLA
lowers to one gather per operand.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from big_vision_tpu.models.ppp import gemma

# Model fields forwarded verbatim into the gemma config.
_FORWARDED = ("scan", "remat_policy", "dropout", "dropout_bdims",
              "cache_dtype", "attn_impl", "decode_impl", "quant")
# Model fields forwarded only when not None (config keeps its default).
_OPTIONAL = ("vocab_size", "final_logits_softcap", "attn_logits_softcap")


def _get_config(model):
  config = gemma.get_config(model.variant)
  for field in _FORWARDED:
    setattr(config, field, getattr(model, field))
  for field in _OPTIONAL:
    value = getattr(model, field)
    if value is not None:
      setattr(config, field, value)
  return config


def _right_align(x, input_mask, attn_mask):
  """Shifts each example so its valid tokens end at the sequence end.

  Equivalent to a per-example jnp.roll by -len(prompt), expressed as one
  modular gather over the batch (no vmap): out[i] = in[(i + len) % L].
  """
  length = x.shape[1]
  shift = jnp.sum(input_mask, axis=-1)  # prompt length per example
  idx = (jnp.arange(length)[None, :] + shift[:, None]) % length
  x = jnp.take_along_axis(x, idx[:, :, None], axis=1)
  input_mask = jnp.take_along_axis(input_mask, idx, axis=1)
  attn_mask = jnp.take_along_axis(attn_mask, idx[:, :, None], axis=1)
  attn_mask = jnp.take_along_axis(attn_mask, idx[:, None, :], axis=2)
  return x, input_mask, attn_mask


class Model(nn.Module):
  """Gemma with the embed/compute_logits/prefill/extend protocol."""
  variant: str = "gemma_2b"
  # Override hooks (None = keep the variant config's value).
  vocab_size: Optional[int] = None
  final_logits_softcap: Optional[float] = None
  attn_logits_softcap: Optional[float] = None
  # Execution knobs forwarded into the LM.
  quant: bool = False
  scan: bool = True
  attn_impl: str = "xla"
  decode_impl: str = "xla"  # "flash": fused Pallas AR step (serving)
  cache_dtype: Optional[str] = "bfloat16"
  remat_policy: str = "nothing_saveable"
  dropout: float = 0.0
  dropout_bdims: Tuple[int, ...] = ()

  def setup(self):
    # parent+name="" splices the LM's params directly into this module's
    # tree (no extra nesting level), keeping checkpoint layout identical.
    cfg = _get_config(self)
    self.model = gemma.Model(name="", parent=self.scope, **cfg)

  def embed_tokens(self, tokens, train=False):
    """int32[B,T] -> float[B,T,D] vocab embeddings."""
    embs = self.model(tokens, deterministic=not train, embed_only=True)
    return embs

  def compute_logits(self, pre_logits, train=False):
    logits, _ = self.model(None, deterministic=not train,
                           pre_logits=pre_logits)
    return logits

  def __call__(self, embs, mask=None, train=False, seg=None):
    """float[B,T,D] embeddings -> (logits, aux); mask defaults causal."""
    assert embs.shape[-1] == self.embdim
    empty = jnp.zeros([embs.shape[0], 0], dtype=jnp.int32)
    return self.model(tokens=empty, embedded_prefix=embs, mask=mask,
                      deterministic=not train, seg=seg)

  def prefill_cache(self, x, input_mask, attn_mask, *, cache_size):
    """Fills the cache with a prompt; returns the last valid token's logits.

    Inputs are left-aligned float[B,N,D] embeddings with bool[B,N]
    input_mask and bool[B,N,N] attn_mask (which must already deny attention
    to padding). The prompt occupies the first N cache slots; each
    extend_cache consumes one more.
    """
    aligned = _right_align(x, input_mask, attn_mask)
    x, input_mask, attn_mask = aligned
    batch, prefill_len, _ = x.shape
    nprompt = jnp.sum(input_mask, axis=-1)

    # Per-example cache bookkeeping. cache_end is identical across the
    # batch by construction (that's the point of right-alignment) but is
    # stored per-example so batch-first sharding rules apply untouched.
    bookkeeping = {
        "seq_len": nprompt,
        "cache_begin": prefill_len - nprompt,
        "cache_end": jnp.full((batch,), prefill_len, jnp.int32),
    }
    for slot, value in bookkeeping.items():
      self.put_variable("cache", slot, value)

    # Widen the attention mask to the full cache: future slots are denied.
    deny = jnp.zeros(
        (batch, prefill_len, cache_size - prefill_len), attn_mask.dtype)
    _, aux = self.model(
        tokens=None, decode=True,
        mask=jnp.concatenate([attn_mask, deny], axis=-1),
        positions=jnp.cumsum(input_mask, axis=-1) - 1, embedded_prefix=x)
    return self.compute_logits(aux["pre_logits"][:, -1:])

  def extend_cache(self, x):
    """One-token cache extension; returns [B, 1, V] logits."""
    assert x.shape[1] == 1, "extend_cache is one token at a time"
    # Cache storage is [..., kv_heads, cache_size, head_dim] in BOTH layer
    # layouts (scan adds a leading layer axis), so shape[-2] reads the
    # cache size regardless of self.model.scan (reference supports scan
    # only: gemma_bv.py:163-167).
    from flax import traverse_util
    k_caches = [v for path, v in
                traverse_util.flatten_dict(self.variables["cache"]).items()
                if path[-1] == "k_cache"]
    assert k_caches, "extend_cache called before prefill_cache"
    cache_size = k_caches[0].shape[-2]

    bump = lambda slot, v: (self.put_variable("cache", slot, v), v)[1]
    positions = self.get_variable("cache", "seq_len")
    bump("seq_len", positions + 1)

    # The new token may attend every in-use slot, itself included.
    lo = self.get_variable("cache", "cache_begin")
    hi = bump("cache_end", self.get_variable("cache", "cache_end") + 1)
    slots = jnp.arange(cache_size)[None, None, :]
    visible = (slots >= lo[:, None, None]) & (slots < hi[:, None, None])

    logits, _ = self.model(tokens=None, decode=True, mask=visible,
                           positions=positions[:, None],
                           embedded_prefix=x)
    return logits

  @property
  def embdim(self):
    width = _get_config(self).width
    return width


def load(*a, **kw):
  """Checkpoint loading delegates to the LM's loader (incl. quant paths)."""
  return gemma.load(*a, **kw)
