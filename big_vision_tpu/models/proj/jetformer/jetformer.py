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
  * The GMM head returns our distrax-free mixtures
    (models/proj/givt/distributions.py) so sampling/NLL are plain jnp.
  * The decode cache is the shared-write-index cache from ppp/gemma.py:
    right-alignment makes every example's write slot identical, so cache
    extension is one dynamic_update_slice (no per-example scatter).
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
  assert x.ndim == 2 and attn_mask.ndim == 2 and input_mask.ndim == 1
  if x.shape[0] == 0:
    return x, attn_mask, input_mask
  seqlen = jnp.sum(input_mask)
  # Stable sort of [False..True] = the right-alignment permutation.
  order = jnp.argsort(input_mask.astype(jnp.int32), stable=True)
  x = x[order]
  attn_mask = attn_mask[order][:, order]
  input_mask = jnp.arange(x.shape[0]) >= (x.shape[0] - seqlen)
  return x, attn_mask, input_mask


class GemmaBackbone(nn.Module):
  """Gemma decoder stack without embedder/LM-head (ref jetformer.py:93)."""

  width: int
  depth: int
  mlp_dim: int
  num_heads: int
  num_kv_heads: int
  head_dim: int
  norm_eps: float = 1e-6

  dropout: float = 0.0
  dropout_bdims: tuple = ()
  cache_dtype: Optional[str] = None
  embed_dtype: str = "float32"

  scan: bool = False
  remat_policy: str = "none"

  @nn.compact
  def __call__(self, x, *, mask, positions=None, decode=False,
               deterministic=True):
    """x: [B, T, E] pre-embedded tokens -> (normed, out) like ref :117."""
    out = {}
    x = x.astype(self.embed_dtype)
    batch_size, seq_len, _ = x.shape

    if decode:
      assert positions is not None and mask is not None, (
          "decode=True requires explicit positions and mask")
    if positions is None:
      positions = jnp.arange(seq_len, dtype=jnp.int32)[None, :]
    assert positions.shape[1] == x.shape[1]

    if mask.ndim == 3:
      mask = mask[:, None, :, :]
    cache_size = max(seq_len, mask.shape[-1])
    assert mask.shape == (batch_size, 1, seq_len, cache_size), mask.shape

    if self.remat_policy == "none":
      block_cls = gemma.Block
    else:
      block_cls = nn.remat(
          gemma.Block, prevent_cse=not self.scan,
          static_argnums=(5, 6),  # 0=self, 5=decode, 6=deterministic
          policy=getattr(jax.checkpoint_policies, self.remat_policy))

    block_kw = dict(
        num_heads=self.num_heads, head_dim=self.head_dim,
        num_kv_heads=self.num_kv_heads, embed_dim=self.width,
        hidden_dim=self.mlp_dim, dropout=self.dropout,
        dropout_bdims=self.dropout_bdims, cache_dtype=self.cache_dtype,
        # Gemma v1 settings (ref jetformer.py:174).
        query_pre_attn_norm="rsqrt_head_dim",
        attn_logits_softcap=None, post_norms=False)

    layers = self.scope.push("layers")
    if self.scan:
      blocks = [nn.scan(
          block_cls,
          variable_axes={"params": 0, "cache": 1},
          split_rngs={"params": True, "dropout": True},
          in_axes=nn.broadcast,
          length=self.depth)(parent=layers, **block_kw)]
    else:
      blocks = [block_cls(parent=layers.push(str(i)), **block_kw)
                for i in range(self.depth)]

    unused_scan_arg = ()
    for block in blocks:
      x, unused_scan_arg = block(x, unused_scan_arg, positions, mask,
                                 decode, deterministic)
    out["encoded"] = x
    x = gemma.RMSNorm(name="final_norm")(x)
    out["pre_logits"] = x
    return x, out


class Model(nn.Module):
  """JetFormer decoder-only model (ref jetformer.py:220)."""
  width: int
  depth: int
  mlp_dim: int
  num_heads: int
  num_kv_heads: int
  head_dim: int
  norm_eps: float = 1e-6

  dropout: float = 0.0
  dropout_bdims: tuple = ()
  cache_dtype: Optional[str] = None
  embed_dtype: str = "float32"
  scan: bool = False
  remat_policy: str = "none"

  vocab_size: int = 1000
  bos_id: Optional[int] = None
  boi_id: Optional[int] = None
  nolabel_id: Optional[int] = None
  # Repeat the text vocab this many times (class-conditional generation with
  # text_len=1 gets `num_vocab_repeats` distinct class embeddings).
  num_vocab_repeats: int = 1
  causal_mask_on_prefix: bool = True
  untie_output_vocab: bool = False

  num_mixtures: int = 4
  multivariate: bool = False
  out_dim: int = 32
  scale_tol: float = 1e-6
  head_dtype: str = "float32"
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

    self.text_emb = nn.Embed(
        self.vocab_size * self.num_vocab_repeats, self.width,
        name="EmbedText",
        embedding_init=nn.initializers.normal(stddev=1.0))
    if self.untie_output_vocab:
      assert self.num_vocab_repeats == 1
      self._text_logits = nn.Dense(
          self.vocab_size, name="LogitsText",
          kernel_init=nn.initializers.normal(stddev=1.0))

    self.img_emb = nn.Dense(self.width, name="EmbedImage")
    self._img_logits = nn.Dense(
        self.num_logits, kernel_init=nn.initializers.zeros,
        name="LogitsImage", dtype=self.head_dtype)

    if self.per_modality_final_norm:
      self.text_norm = gemma.RMSNorm(name="TextNorm")
      self.img_norm = gemma.RMSNorm(name="ImageNorm")

    self.decoder = GemmaBackbone(
        width=self.width, depth=self.depth, mlp_dim=self.mlp_dim,
        num_heads=self.num_heads, num_kv_heads=self.num_kv_heads,
        head_dim=self.head_dim, norm_eps=self.norm_eps,
        dropout=self.dropout, dropout_bdims=self.dropout_bdims,
        cache_dtype=self.cache_dtype, embed_dtype=self.embed_dtype,
        scan=self.scan, remat_policy=self.remat_policy)

  # ------------------------------------------------------------------
  # Decode-cache protocol (prefill + one-token extension).
  # ------------------------------------------------------------------

  def prefill_cache(self, x, attn_mask, input_mask, *, cache_size):
    """Fills the cache with right-aligned `x` [B, N, E]; returns pre-logits.

    Outputs are positionally right-aligned too: x_out[:, -1:] is the last
    valid prefilled token of every example (ref jetformer.py:323).
    """
    _, prefill_len, _ = x.shape
    x, attn_mask, input_mask = right_align(x, attn_mask, input_mask)
    seq_len = jnp.sum(input_mask, axis=-1)
    positions = jnp.cumsum(input_mask, axis=-1) - 1

    self.put_variable("cache", "seq_len", seq_len)
    self.put_variable("cache", "cache_begin", prefill_len - seq_len)
    self.put_variable("cache", "cache_end",
                      jnp.full(seq_len.shape, prefill_len))

    attn_mask = jnp.pad(
        attn_mask, ((0, 0), (0, 0), (0, cache_size - prefill_len)))
    x, out = self.decoder(x, positions=positions, mask=attn_mask,
                          decode=True)
    if self.per_modality_final_norm:
      x = out["encoded"]
    return x

  def extend_cache(self, x):
    """Extends the cache by one token `x` [B, 1, E]; returns pre-logits."""
    assert x.shape[1] == 1, "extend_cache is one token at a time"
    if self.decoder.scan:
      cache_size = self.variables["cache"]["decoder"]["layers"]["attn"][
          "k_cache"].shape[2]
    else:
      cache_size = self.variables["cache"]["decoder"]["layers"]["0"][
          "attn"]["k_cache"].shape[1]

    positions = self.get_variable("cache", "seq_len")
    self.put_variable("cache", "seq_len", positions + 1)

    cache_begin = self.get_variable("cache", "cache_begin")
    cache_end = self.get_variable("cache", "cache_end") + 1
    self.put_variable("cache", "cache_end", cache_end)
    mask = jnp.logical_and(
        jnp.arange(cache_size)[None, None, :] >= cache_begin[:, None, None],
        jnp.arange(cache_size)[None, None, :] < cache_end[:, None, None])

    x, out = self.decoder(x, positions=positions[:, None], mask=mask,
                          decode=True)
    if self.per_modality_final_norm:
      x = out["encoded"]
    return x

  # ------------------------------------------------------------------
  # Distribution heads.
  # ------------------------------------------------------------------

  def _square_plus(self, x):
    return (x + jnp.sqrt(jnp.square(x) + 4)) / 2

  def get_pdf(self, logits, temperature_scales=None, temperature_probs=None):
    """GMM over image soft tokens from raw head outputs (ref :380)."""
    assert logits.shape[-1] == self.num_logits
    if self.multivariate:
      scales = logits[..., :self.out_dim ** 2]
      locs = logits[..., self.out_dim ** 2:]
      scales = self._square_plus(scales)
      *lead, _ = scales.shape
      scales = scales.reshape(*lead, self.out_dim, self.out_dim)
      scales = jnp.maximum(scales, jnp.eye(self.out_dim) * self.scale_tol)
      if (t := temperature_scales) is not None:
        scales = scales * t
      return distributions.MultivariateNormalTri(locs, scales)

    *shape, _ = logits.shape
    prob_logits = logits[..., :self.num_mixtures]
    if (t := temperature_probs) is not None:
      prob_logits = prob_logits * t
    other = logits[..., self.num_mixtures:].reshape(
        *shape, self.num_mixtures, 2, self.out_dim)
    locs = other[..., 0, :]
    scales = jnp.maximum(self._square_plus(other[..., 1, :]), self.scale_tol)
    if (t := temperature_scales) is not None:
      scales = scales * t
    return distributions.DiagMixture(prob_logits, locs, scales)

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

    positions = jnp.cumsum(input_mask, axis=-1) - 1
    prelogits, decoder_out = self.decoder(
        x, mask=attn_mask, positions=positions, deterministic=not train)
    if self.per_modality_final_norm:
      prelogits = decoder_out["encoded"]

    text_prelogits, img_prelogits = self.split_image_and_text_prelogits(
        prelogits, text_first_mask, text_tokens.shape[1],
        image_tokens.shape[1])

    text_logits = self.text_logits(text_prelogits)
    pmf = self.get_pmf(text_logits)
    image_logits = self.img_logits(img_prelogits)
    pdf = self.get_pdf(image_logits)
    return text_logits, image_logits, pmf, pdf, decoder_out

  def embed_image_and_text(self, text_tokens, image_tokens, *,
                           text_first_mask, text_input_mask=None,
                           drop_prefix=None, shift=True):
    """Builds the interleaved sequence for both orders (ref :501)."""
    assert text_tokens is not None and image_tokens is not None
    if text_input_mask is None:
      text_input_mask = jnp.full(text_tokens.shape, True)

    txt_prefix, img_prefix = text_first_mask, ~text_first_mask

    if self.num_vocab_repeats > 1:
      offsets = jnp.repeat(
          jnp.arange(self.num_vocab_repeats) * self.vocab_size,
          text_tokens.shape[1])
      def _repeat_text(tokens):
        return jnp.tile(tokens, (1, self.num_vocab_repeats)) + offsets[None]
      nolabel = self.text_emb(_repeat_text(
          jnp.full_like(text_tokens, self.nolabel_id)))
      text_tokens = _repeat_text(text_tokens)
      text_input_mask = jnp.tile(text_input_mask,
                                 (1, self.num_vocab_repeats))
    else:
      nolabel = self.lookup_token(self.nolabel_id, batch_size=1)
    x_txt = self.text_emb(text_tokens)
    x_img = self.img_emb(image_tokens)

    x_txt_m = text_input_mask
    x_img_m = jnp.full(x_img.shape[:-1], True)

    if drop_prefix is not None:
      drop_txt = txt_prefix & drop_prefix
      drop_img = img_prefix & drop_prefix
      x_txt = jnp.where(drop_txt[:, None, None], nolabel, x_txt)
      # A dropped prefix is always fully "valid" (it's all nolabel).
      x_txt_m = jnp.where(
          drop_txt[:, None], jnp.full_like(x_txt_m, True), x_txt_m)
      x_img = jnp.where(drop_img[:, None, None], nolabel[:, :1, :], x_img)

    batch_size = image_tokens.shape[0]
    bos = self.lookup_token(self.bos_id, batch_size)
    bos_m = jnp.full(bos.shape[:-1], True)
    if self.boi_id is not None:
      # [bos, text, boi, image] / [boi, image, bos, text]
      boi = self.lookup_token(self.boi_id, batch_size)
      boi_m = jnp.full(boi.shape[:-1], True)
      x_txt_img = jnp.concatenate([bos, x_txt, boi, x_img], axis=1)
      x_txt_img_m = jnp.concatenate([bos_m, x_txt_m, boi_m, x_img_m], 1)
      x_img_txt = jnp.concatenate([boi, x_img, bos, x_txt], axis=1)
      x_img_txt_m = jnp.concatenate([boi_m, x_img_m, bos_m, x_txt_m], 1)
    else:
      # [bos, text, image] / [bos, image, text]
      x_txt_img = jnp.concatenate([bos, x_txt, x_img], axis=1)
      x_txt_img_m = jnp.concatenate([bos_m, x_txt_m, x_img_m], axis=1)
      x_img_txt = jnp.concatenate([bos, x_img, x_txt], axis=1)
      x_img_txt_m = jnp.concatenate([bos_m, x_img_m, x_txt_m], axis=1)

    if shift:
      x_txt_img, x_img_txt = x_txt_img[:, :-1], x_img_txt[:, :-1]
      x_txt_img_m, x_img_txt_m = x_txt_img_m[:, :-1], x_img_txt_m[:, :-1]

    x = jnp.where(txt_prefix[:, None, None], x_txt_img, x_img_txt)
    input_mask = jnp.where(txt_prefix[:, None], x_txt_img_m, x_img_txt_m)

    batch_size, seq_len = x.shape[:2]
    attn_mask = nn.attention.make_causal_mask(
        jnp.ones([batch_size, seq_len])).squeeze(1)
    if not self.causal_mask_on_prefix:
      txt_prefix_mask = jnp.full_like(
          input_mask, False).at[:, :x_txt.shape[1] + 1].set(True)
      img_prefix_mask = jnp.full_like(
          input_mask, False).at[:, :x_img.shape[1] + 1].set(True)
      prefix_mask = jnp.where(
          txt_prefix[:, None], txt_prefix_mask, img_prefix_mask)
      attn_mask = jnp.logical_or(attn_mask, prefix_mask[:, None, :])

    # No token may attend to an invalid (padding) token.
    attn_mask = jnp.logical_and(attn_mask, input_mask[:, None, :])
    return x, attn_mask, input_mask

  def split_image_and_text_prelogits(self, prelogits, text_first_mask,
                                     text_len, image_len):
    """Undo the two interleavings (ref :593)."""
    if self.boi_id is not None:
      a_txt = prelogits[:, :text_len]
      a_img = prelogits[:, self.num_vocab_repeats * text_len + 1:]
      b_img = prelogits[:, :image_len]
      b_txt = prelogits[:, image_len + 1:image_len + 1 + text_len]
    else:
      a_txt = prelogits[:, :text_len]
      a_img = prelogits[:, self.num_vocab_repeats * text_len:]
      b_img = prelogits[:, :image_len]
      b_txt = prelogits[:, image_len:image_len + text_len]
    txt = jnp.where(text_first_mask[:, None, None], a_txt, b_txt)
    img = jnp.where(text_first_mask[:, None, None], a_img, b_img)
    return txt, img

  def lookup_token(self, token_id, batch_size):
    """Embeds a static special token (bos/boi/nolabel)."""
    assert isinstance(token_id, int)
    return jnp.repeat(
        self.text_emb(jnp.full((1, 1), token_id)), batch_size, axis=0)

  def text_logits(self, pre_logits):
    if self.per_modality_final_norm:
      pre_logits = self.text_norm(pre_logits)
    if self.untie_output_vocab:
      return self._text_logits(pre_logits)
    return self.text_emb.attend(pre_logits)

  def img_logits(self, pre_logits):
    if self.per_modality_final_norm:
      pre_logits = self.img_norm(pre_logits)
    return self._img_logits(pre_logits)

  def get_drop_labels(self, rng, batch_size):
    if (p := self.drop_labels_probability) > 0:
      return jax.random.uniform(rng, shape=(batch_size,)) <= p
    return None


def load(init_params, init_files, model_params=None, dont_load=()):
  """Loads params from a checkpoint and merges into init_params."""
  del model_params
  assert isinstance(init_files, str), init_files
  ckpt_params = u.load_params(init_files)
  return common.merge_params(ckpt_params, init_params, dont_load)
