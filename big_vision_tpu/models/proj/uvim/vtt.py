"""UViM stage-II: vision-text-transformer (LM over stage-I VQ codes).

Behavior parity: reference models/proj/uvim/vtt.py — ViT image encoder +
causal decoder with cross-attention, flax decode cache for AR sampling,
shift-right teacher forcing, zero-init logits head. Param tree names match
the reference so stage-II checkpoints load unmodified.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.models import common, vit


def load(init_params, init_files, model_params=None,
         dont_load=("head/kernel", "head/bias", "cls")):
  """Loads a full VTT checkpoint, or just its ViT encoder sub-tree."""
  del model_params
  import flax.training.checkpoints

  if isinstance(init_files, str):  # Whole-model checkpoint.
    params = flax.training.checkpoints.convert_pre_linen(
        u.load_params(init_files))
    if init_params is not None:
      params = common.merge_params(params, init_params, dont_load)
    return params

  # {"encoder": <vit ckpt>}: borrow a plain ViT through vit.load (which
  # handles historical layouts + posemb resampling), then graft its pieces
  # into this model's naming.
  grafts = {"pos_embedding_encoder": "pos_embedding",
            "encoder": "Transformer",
            "EmbedPatches": "embedding"}
  remaining = {**init_files}
  enc_init = remaining.pop("encoder", None)
  if not enc_init:
    raise ValueError(f"Only encoder init is supported: {remaining}")
  params = dict(init_params)
  as_vit = {vit_key: params[my_key] for my_key, vit_key in grafts.items()}
  loaded = vit.load(as_vit, enc_init, model_cfg={}, dont_load=dont_load)
  params.update({mine: loaded[theirs] for mine, theirs in grafts.items()})
  return params


def shift_right(x, axis=1):
  """Teacher forcing: token i predicts token i (inputs shifted by one)."""
  pad = [(0, 0)] * x.ndim
  pad[axis] = (1, 0)
  return jax.lax.slice_in_dim(jnp.pad(x, pad), 0, x.shape[axis], axis=axis)


def _resolve_patch_size(patches):
  """Accepts dict/ConfigDict {"size": p}, dataclass .size, int, or tuple."""
  try:
    size = patches["size"]
  except (TypeError, KeyError, IndexError):
    size = patches if isinstance(patches, (tuple, list)) else patches.size
  return (size, size) if isinstance(size, int) else tuple(size)


class EncoderDecoderBlock(nn.Module):
  mlp_dim: int
  num_heads: int
  dropout_rate: float = 0.0
  decode: bool = False

  @nn.compact
  def __call__(self, tokens, memory, decoder_mask=None,
               deterministic=True):
    def attn(name, decode=False):
      return nn.MultiHeadDotProductAttention(
          name=name, decode=decode, num_heads=self.num_heads,
          dropout_rate=self.dropout_rate, broadcast_dropout=False,
          use_bias=False)
    drop = nn.Dropout(rate=self.dropout_rate)
    norm = lambda i, t: nn.LayerNorm(name=f"LayerNorm{i}")(t)

    # Sublayer 1: causal (or cache-driven) self-attention.
    h = tokens + drop(
        attn("SelfAttn", decode=self.decode)(
            norm(1, tokens), mask=decoder_mask,
            deterministic=deterministic),
        deterministic)
    # Sublayer 2: cross-attention over the encoded image.
    h += drop(attn("CrossAttn")(norm(2, h), memory,
                                deterministic=deterministic),
              deterministic)
    # Sublayer 3: MLP.
    mlp = vit.MlpBlock(name="MLP", dropout=self.dropout_rate,
                       mlp_dim=self.mlp_dim)
    return h + mlp(norm(3, h), deterministic)


class Decoder(nn.Module):
  num_layers: int
  num_heads: int
  emb_dim: int
  mlp_dim: int
  dropout_rate: float = 0.0
  output_vocab_size: int = 32_000
  zero_decoder_seq: bool = False

  def _embed(self, targets, pos_emb, decode, deterministic):
    """Token ids -> positioned embeddings (shifted unless cache-driven)."""
    tokens = targets.astype("int32")
    if not decode:  # Cache-driven decoding feeds already-shifted tokens.
      tokens = shift_right(tokens)
    h = nn.Embed(name="EmbedTargets",
                 embedding_init=nn.initializers.normal(stddev=1.0),
                 num_embeddings=self.output_vocab_size,
                 features=self.emb_dim)(tokens)
    if self.zero_decoder_seq:
      h = jnp.zeros_like(h)
    h = common.AddPositionEmbs(decode=decode, name="PosEmbedTargets")(
        h, pos_emb)
    return nn.Dropout(rate=self.dropout_rate)(h, deterministic)

  @nn.compact
  def __call__(self, encoded, targets, pos_emb, decoder_mask=None,
               decode=False, deterministic=True,
               max_decode_length=None):  # max_decode_length: API compat
    del max_decode_length
    h = self._embed(targets, pos_emb, decode, deterministic)
    for layer in range(self.num_layers):
      block = EncoderDecoderBlock(
          name=f"EncDecBlock{layer}", decode=decode,
          num_heads=self.num_heads, dropout_rate=self.dropout_rate,
          mlp_dim=self.mlp_dim)
      h = block(h, encoded, decoder_mask=decoder_mask,
                deterministic=deterministic)
    h = nn.LayerNorm(name="LayerNorm")(h)
    return nn.Dense(name="LogitsDense", kernel_init=nn.initializers.zeros,
                    features=self.output_vocab_size)(h)


class Model(nn.Module):
  """Encoder-decoder over (image, code-token) pairs."""
  patches: Any
  # Shared encoder/decoder geometry.
  emb_dim: int = 512
  mlp_dim: int = 2048
  num_layers: int = 6
  num_heads: int = 8
  dropout_rate: float = 0.0
  # Code-token LM head.
  seq_len: int = 256
  vocab_size: int = 32_000
  zero_decoder_seq: bool = False
  # Image side.
  posemb_type: str = "sincos2d"
  input_size: Sequence[int] = (256, 256)

  def setup(self):
    patch_size = _resolve_patch_size(self.patches)
    self._patch_size = patch_size
    grid = tuple(s // p for s, p in zip(self.input_size, patch_size))

    posemb = lambda shape, name: vit.get_posemb(
        self, self.posemb_type, seqshape=shape, width=self.emb_dim,
        name=name)
    self.conv = nn.Conv(self.emb_dim, patch_size, padding="VALID",
                        strides=patch_size, name="EmbedPatches")
    self.pos_emb_for_encoder = posemb(grid, "pos_embedding_encoder")
    self.pos_emb_for_decoder = posemb((1, self.seq_len),
                                      "pos_embedding_decoder")
    self.encoder = vit.Encoder(num_heads=self.num_heads,
                               depth=self.num_layers,
                               dropout=self.dropout_rate,
                               mlp_dim=self.mlp_dim)
    self.decoder = Decoder(num_layers=self.num_layers,
                           num_heads=self.num_heads,
                           emb_dim=self.emb_dim,
                           mlp_dim=self.mlp_dim,
                           dropout_rate=self.dropout_rate,
                           output_vocab_size=self.vocab_size,
                           zero_decoder_seq=self.zero_decoder_seq)

  def encode(self, image, train=False):
    patches = self.conv(image)
    flat = patches.reshape(patches.shape[0], -1, patches.shape[-1])
    memory, _ = self.encoder(flat + self.pos_emb_for_encoder,
                             deterministic=not train)
    return memory

  def decode(self, encoded, targets, decode=False, train=False,
             max_decode_length=None):
    causal = None if decode else nn.make_causal_mask(targets)
    return self.decoder(
        encoded, targets, decoder_mask=causal,
        pos_emb=self.pos_emb_for_decoder, deterministic=not train,
        decode=decode, max_decode_length=max_decode_length)

  def __call__(self, image, text, *, decode=False, train=False):
    memory = self.encode(image, train=train)
    return self.decode(memory, text, decode=decode, train=train)
