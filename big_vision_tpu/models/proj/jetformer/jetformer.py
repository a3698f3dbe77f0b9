"""JetFormer: one decoder-only transformer over text tokens + soft image tokens.

Parity target: reference models/proj/jetformer/jetformer.py. A Gemma-style
backbone (no tied embedder / LM head) consumes interleaved [text, image] or
[image, text] sequences; text positions get categorical logits (tied or
untied vocab), image positions get GMM parameters over continuous "soft
tokens" produced by an invertible flow (Jet) on top of patch-PCA latents.

TPU-native differences from the reference:
  * `right_align` (ref :36-70) is a stable-argsort gather instead of two
    O(L^2) one-hot einsums: sorting the boolean input mask moves padding to
    the front while preserving token order, which is the exact permutation
    the reference builds. O(L log L), no LxL bool intermediates.
  * Sequence assembly: the reference materializes BOTH modality orders
    ([bos,text,boi,image] AND [boi,image,bos,text]) and jnp.where-selects,
    touching every embedded byte three times. Here the segments are embedded
    once into a single buffer and each example gathers its order's static
    permutation (`take_along_axis`) — one pass over the [B, T, E] stream.
    Same trick for splitting prelogits back into modalities.
  * Attention masks come from iota comparisons (fused by XLA), not
    make_causal_mask + one-hot algebra.
  * The block stack is gemma.decoder_stack — the exact scan/remat/cache
    machinery the PaliGemma LLM uses, so param/cache trees match the
    reference layout by construction.
  * The GMM head returns our distrax-free mixtures
    (models/proj/givt/distributions.py) so sampling/NLL are plain jnp.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

import big_vision_tpu.utils as u
from big_vision_tpu.models import common
from big_vision_tpu.models.ppp import gemma
from big_vision_tpu.models.proj.givt import distributions


@jax.vmap
def right_align(x, attn_mask, input_mask):
  """Right-aligns valid tokens (mask can be False anywhere, order is kept).

  Matches reference jetformer.py:36: padded tokens move to the front, valid
  tokens keep their relative order and end flush at the sequence end. The
  content at padding positions is unspecified garbage here (reference zeroes
  it); every consumer masks those positions out via `attn_mask` columns and
  the returned right-aligned `input_mask`, so the two are equivalent.
  """
  assert (x.ndim, attn_mask.ndim, input_mask.ndim) == (2, 2, 1)
  length = x.shape[0]
  if length == 0:
    return x, attn_mask, input_mask
  # Stable sort of [False..True] = the right-alignment permutation.
  order = jnp.argsort(input_mask.astype(jnp.int32), stable=True)
  n_valid = jnp.sum(input_mask)
  aligned_mask = jnp.arange(length) >= (length - n_valid)
  return x[order], attn_mask[order][:, order], aligned_mask


square_plus = distributions.square_plus


class Model(nn.Module):
  """JetFormer decoder-only model (ref jetformer.py:220)."""
  # Gemma-style backbone geometry.
  width: int
  depth: int
  mlp_dim: int
  num_heads: int
  num_kv_heads: int
  head_dim: int
  norm_eps: float = 1e-6
  # Execution knobs.
  embed_dtype: str = "float32"
  head_dtype: str = "float32"
  cache_dtype: Optional[str] = None
  scan: bool = False
  remat_policy: str = "none"
  dropout: float = 0.0
  dropout_bdims: tuple = ()
  # Text side: vocabulary + special ids.
  vocab_size: int = 1000
  bos_id: Optional[int] = None
  boi_id: Optional[int] = None
  nolabel_id: Optional[int] = None
  untie_output_vocab: bool = False
  # Repeat the text vocab this many times (class-conditional generation with
  # text_len=1 gets `num_vocab_repeats` distinct class embeddings).
  num_vocab_repeats: int = 1
  causal_mask_on_prefix: bool = True
  # Image side: GMM head over soft tokens.
  out_dim: int = 32
  num_mixtures: int = 4
  multivariate: bool = False
  scale_tol: float = 1e-6
  per_modality_final_norm: bool = False
  drop_labels_probability: float = 0.0  # >0 enables CFG training.

  @property
  def num_logits(self) -> int:
    if self.multivariate:
      assert self.num_mixtures == 1
      return round(self.out_dim ** 2) + self.out_dim
    return self.num_mixtures + 2 * self.num_mixtures * self.out_dim

  def setup(self):
    assert self.num_mixtures > 0
    if self.multivariate and self.num_mixtures != 1:
      raise ValueError("Multivariate GMM requires num_mixtures == 1.")

    normal1 = nn.initializers.normal(stddev=1.0)
    vocab_rows = self.vocab_size * self.num_vocab_repeats
    self.text_emb = nn.Embed(vocab_rows, self.width, name="EmbedText",
                             embedding_init=normal1)
    if self.untie_output_vocab:
      assert self.num_vocab_repeats == 1
      self._text_logits = nn.Dense(self.vocab_size, name="LogitsText",
                                   kernel_init=normal1)

    self.img_emb = nn.Dense(self.width, name="EmbedImage")
    self._img_logits = nn.Dense(self.num_logits, name="LogitsImage",
                                dtype=self.head_dtype,
                                kernel_init=nn.initializers.zeros)
    if self.per_modality_final_norm:
      self.text_norm = gemma.RMSNorm(name="TextNorm")
      self.img_norm = gemma.RMSNorm(name="ImageNorm")

  # ------------------------------------------------------------------
  # Backbone: the PaliGemma block stack minus embedder/LM-head.
  # ------------------------------------------------------------------

  def _backbone(self, x, *, mask, positions=None, decode=False,
                deterministic=True):
    """Runs [B, T, E] through the decoder; returns (final_norm(x), out)."""
    out = {}
    x = x.astype(self.embed_dtype)
    positions, mask = gemma.prep_positions_mask(x, positions, mask, decode)
    dec = self.scope.push("decoder")
    run = gemma.decoder_stack(
        dec, self.depth, self.scan, self.remat_policy,
        dict(num_heads=self.num_heads, head_dim=self.head_dim,
             num_kv_heads=self.num_kv_heads, embed_dim=self.width,
             hidden_dim=self.mlp_dim, dropout=self.dropout,
             dropout_bdims=self.dropout_bdims, cache_dtype=self.cache_dtype,
             # Gemma v1 settings (ref jetformer.py:174).
             query_pre_attn_norm="rsqrt_head_dim",
             attn_logits_softcap=None, post_norms=False))
    x = out["encoded"] = run(x, positions, mask, decode, deterministic)
    x = out["pre_logits"] = gemma.RMSNorm(
        parent=dec.push("final_norm"))(x)
    return x, out

  def _backbone_prelogits(self, *args, **kw):
    """Backbone output feeding the heads: pre- or post-final-norm."""
    x, out = self._backbone(*args, **kw)
    return (out["encoded"] if self.per_modality_final_norm else x), out

  # ------------------------------------------------------------------
  # Decode-cache protocol (prefill + one-token extension).
  # ------------------------------------------------------------------

  def prefill_cache(self, x, attn_mask, input_mask, *, cache_size):
    """Fills the cache with right-aligned `x` [B, N, E]; returns pre-logits.

    Outputs are positionally right-aligned too: x_out[:, -1:] is the last
    valid prefilled token of every example (ref jetformer.py:323).
    """
    prefill_len = x.shape[1]
    x, attn_mask, input_mask = right_align(x, attn_mask, input_mask)
    seq_len = jnp.sum(input_mask, axis=-1)

    # Valid-window bookkeeping for extend_cache.
    window = {"seq_len": seq_len,
              "cache_begin": prefill_len - seq_len,
              "cache_end": jnp.full(seq_len.shape, prefill_len)}
    for key, value in window.items():
      self.put_variable("cache", key, value)

    pad_cols = ((0, 0), (0, 0), (0, cache_size - prefill_len))
    x, _ = self._backbone_prelogits(
        x, positions=jnp.cumsum(input_mask, axis=-1) - 1,
        mask=jnp.pad(attn_mask, pad_cols), decode=True)
    return x

  def extend_cache(self, x):
    """Extends the cache by one token `x` [B, 1, E]; returns pre-logits."""
    assert x.shape[1] == 1, "extend_cache is one token at a time"
    cache = self.variables["cache"]["decoder"]["layers"]
    # Cache storage is [..., kv_heads, cache_size, head_dim]; scan adds a
    # leading layer axis, so shape[-2] is the cache size either way.
    if self.scan:
      cache_size = cache["attn"]["k_cache"].shape[-2]
    else:
      cache_size = cache["0"]["attn"]["k_cache"].shape[-2]

    positions = self.get_variable("cache", "seq_len")
    self.put_variable("cache", "seq_len", positions + 1)

    # The valid cache window [begin, end) grows by one on the right; the new
    # token may attend to exactly that window (incl. itself).
    begin = self.get_variable("cache", "cache_begin")
    end = self.get_variable("cache", "cache_end") + 1
    self.put_variable("cache", "cache_end", end)
    slot = jnp.arange(cache_size)[None, None, :]
    mask = (slot >= begin[:, None, None]) & (slot < end[:, None, None])

    x, _ = self._backbone_prelogits(
        x, positions=positions[:, None], mask=mask, decode=True)
    return x

  # ------------------------------------------------------------------
  # Distribution heads.
  # ------------------------------------------------------------------

  def get_pdf(self, logits, temperature_scales=None, temperature_probs=None):
    """GMM over image soft tokens from raw head outputs (ref :380)."""
    assert logits.shape[-1] == self.num_logits
    if self.multivariate:
      return distributions.mvn_tri_from_raw(
          logits, out_dim=self.out_dim, scale_tol=self.scale_tol,
          temp_scales=temperature_scales)
    return distributions.mixture_from_raw(
        logits, num_mixtures=self.num_mixtures, out_dim=self.out_dim,
        scale_tol=self.scale_tol, temp_scales=temperature_scales,
        temp_probs=temperature_probs)

  @staticmethod
  def get_pmf(logits):
    return distributions.Categorical(logits)

  # ------------------------------------------------------------------
  # Teacher-forced forward pass.
  # ------------------------------------------------------------------

  def __call__(self, text_tokens, image_tokens, text_first_mask, *,
               text_input_mask=None, drop_prefix=None, train=False):
    """Returns (text_logits, image_logits, pmf, pdf, decoder_out)."""
    x, attn_mask, input_mask = self.embed_image_and_text(
        text_tokens, image_tokens, text_first_mask=text_first_mask,
        text_input_mask=text_input_mask, drop_prefix=drop_prefix)

    prelogits, decoder_out = self._backbone_prelogits(
        x, mask=attn_mask, positions=jnp.cumsum(input_mask, axis=-1) - 1,
        deterministic=not train)

    text_prelogits, img_prelogits = self.split_image_and_text_prelogits(
        prelogits, text_first_mask, text_tokens.shape[1],
        image_tokens.shape[1])

    text_logits = self.text_logits(text_prelogits)
    image_logits = self.img_logits(img_prelogits)
    return (text_logits, image_logits, self.get_pmf(text_logits),
            self.get_pdf(image_logits), decoder_out)

  def _segment_layout(self, text_len, image_len):
    """Static gather indices realizing both modality orders.

    The embedded buffer is [bos, (boi,) text, image]; `take_along_axis` with
    one of these index vectors yields the text-first or image-first
    interleaving (ref :543-561 builds both orders densely instead).
    """
    has_boi = self.boi_id is not None
    t0 = 1 + has_boi  # First text slot in the buffer.
    txt = jnp.arange(text_len) + t0
    img = jnp.arange(image_len) + t0 + text_len
    bos, boi = jnp.array([0]), jnp.array([1])
    if has_boi:
      text_first = jnp.concatenate([bos, txt, boi, img])
      image_first = jnp.concatenate([boi, img, bos, txt])
    else:
      text_first = jnp.concatenate([bos, txt, img])
      image_first = jnp.concatenate([bos, img, txt])
    return text_first, image_first

  def embed_image_and_text(self, text_tokens, image_tokens, *,
                           text_first_mask, text_input_mask=None,
                           drop_prefix=None, shift=True):
    """Builds the interleaved sequence for both orders (ref :501)."""
    assert text_tokens is not None
    assert image_tokens is not None
    txt_prefix = text_first_mask
    if text_input_mask is None:
      text_input_mask = jnp.full(text_tokens.shape, True)

    # Embed each modality once.
    repeats = self.num_vocab_repeats
    if repeats > 1:
      # Class-conditional mode: r copies of the (length-1) text, each shifted
      # into its own vocab slice, so every repeat gets a distinct embedding.
      slice_of = jnp.arange(repeats) * self.vocab_size
      offsets = jnp.repeat(slice_of, text_tokens.shape[1])[None]
      widen = lambda t: jnp.tile(t, (1, repeats)) + offsets
      nolabel_ids = jnp.full_like(text_tokens, self.nolabel_id)
      nolabel = self.text_emb(widen(nolabel_ids))
      text_tokens = widen(text_tokens)
      text_input_mask = jnp.tile(text_input_mask, (1, repeats))
    else:
      nolabel = self.lookup_token(self.nolabel_id, batch_size=1)
    x_txt = self.text_emb(text_tokens)
    x_img = self.img_emb(image_tokens)

    # CFG label dropping: a dropped prefix becomes all-nolabel, fully valid.
    img_valid = jnp.full(x_img.shape[:-1], True)
    txt_valid = text_input_mask
    if drop_prefix is not None:
      drop_txt = (txt_prefix & drop_prefix)[:, None]
      drop_img = (~txt_prefix & drop_prefix)[:, None]
      x_txt = jnp.where(drop_txt[..., None], nolabel, x_txt)
      txt_valid = drop_txt | txt_valid
      x_img = jnp.where(drop_img[..., None], nolabel[:, :1, :], x_img)

    # One buffer holding every segment, then a per-example order gather.
    batch = image_tokens.shape[0]
    ones = lambda t: jnp.full(t.shape[:-1], True)
    segs = [self.lookup_token(self.bos_id, batch)]
    if self.boi_id is not None:
      segs.append(self.lookup_token(self.boi_id, batch))
    seg_valid = [ones(s) for s in segs] + [txt_valid, img_valid]
    segs += [x_txt, x_img]

    idx_a, idx_b = self._segment_layout(x_txt.shape[1], x_img.shape[1])
    idx = jnp.where(txt_prefix[:, None], idx_a[None], idx_b[None])
    if shift:  # Teacher forcing: inputs are the sequence minus its last token.
      idx = idx[:, :-1]
    buf = jnp.concatenate(segs, axis=1)
    x = jnp.take_along_axis(buf, idx[..., None], axis=1)
    input_mask = jnp.take_along_axis(
        jnp.concatenate(seg_valid, axis=1), idx, axis=1)

    # Causal (optionally prefix-bidirectional) x valid-key mask, via iota.
    pos = jnp.arange(idx.shape[1])
    attn_mask = (pos[:, None] >= pos[None, :])[None]
    if not self.causal_mask_on_prefix:
      prefix_len = jnp.where(txt_prefix, x_txt.shape[1] + 1,
                             x_img.shape[1] + 1)
      attn_mask = attn_mask | (pos[None, :] < prefix_len[:, None])[:, None, :]
    return x, attn_mask & input_mask[:, None, :], input_mask

  def split_image_and_text_prelogits(self, prelogits, text_first_mask,
                                     text_len, image_len):
    """Undo the interleaving: gather each modality's rows (ref :593)."""
    has_boi = int(self.boi_id is not None)
    # Position of the prediction for token i of each modality, per order.
    # (The shift already happened on the inputs, so text-first text
    # predictions sit at rows [0, text_len).)
    txt0 = jnp.where(text_first_mask, 0, image_len + has_boi)
    img0 = jnp.where(text_first_mask,
                     self.num_vocab_repeats * text_len + has_boi, 0)
    pick = lambda start, n: jnp.take_along_axis(
        prelogits, (start[:, None] + jnp.arange(n))[..., None], axis=1)
    return pick(txt0, text_len), pick(img0, image_len)

  def lookup_token(self, token_id, batch_size):
    """Embeds a static special token (bos/boi/nolabel)."""
    assert isinstance(token_id, int)
    one = self.text_emb(jnp.full((1, 1), token_id))
    return jnp.repeat(one, batch_size, axis=0)

  def text_logits(self, pre_logits):
    if self.per_modality_final_norm:
      pre_logits = self.text_norm(pre_logits)
    head = (self._text_logits if self.untie_output_vocab
            else self.text_emb.attend)
    return head(pre_logits)

  def img_logits(self, pre_logits):
    if self.per_modality_final_norm:
      pre_logits = self.img_norm(pre_logits)
    return self._img_logits(pre_logits)

  def get_drop_labels(self, rng, batch_size):
    p = self.drop_labels_probability
    if not p > 0:
      return None
    return jax.random.uniform(rng, shape=(batch_size,)) <= p


def load(init_params, init_files, model_params=None, dont_load=()):
  """Loads params from a checkpoint and merges into init_params."""
  del model_params
  assert isinstance(init_files, str), init_files
  return common.merge_params(u.load_params(init_files), init_params,
                             dont_load)
