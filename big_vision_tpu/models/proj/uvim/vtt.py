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
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.models import common, vit


def shift_right(x, axis=1):
  """Teacher forcing: token i predicts token i (inputs shifted by one)."""
  import jax
  padded = jnp.pad(x, [(1, 0) if d == axis else (0, 0)
                       for d in range(x.ndim)])
  return jax.lax.slice_in_dim(padded, 0, x.shape[axis], axis=axis)


class EncoderDecoderBlock(nn.Module):
  num_heads: int
  mlp_dim: int
  decode: bool = False
  dropout_rate: float = 0.0

  def _attn(self, name, decode=False):
    return nn.MultiHeadDotProductAttention(
        name=name, decode=decode, num_heads=self.num_heads,
        dropout_rate=self.dropout_rate, broadcast_dropout=False,
        use_bias=False)

  @nn.compact
  def __call__(self, tokens, memory, decoder_mask=None,
               deterministic=True):
    drop = nn.Dropout(rate=self.dropout_rate)

    # Causal (or cache-driven) self-attention sublayer.
    sa = self._attn("SelfAttn", decode=self.decode)(
        nn.LayerNorm(name="LayerNorm1")(tokens),
        mask=decoder_mask, deterministic=deterministic)
    h = tokens + drop(sa, deterministic)

    # Cross-attention over the encoded image.
    ca = self._attn("CrossAttn")(
        nn.LayerNorm(name="LayerNorm2")(h), memory,
        deterministic=deterministic)
    h = h + drop(ca, deterministic)

    # MLP sublayer.
    ff = vit.MlpBlock(name="MLP", dropout=self.dropout_rate,
                      mlp_dim=self.mlp_dim)
    return h + ff(nn.LayerNorm(name="LayerNorm3")(h), deterministic)


class Decoder(nn.Module):
  num_layers: int
  num_heads: int
  emb_dim: int
  mlp_dim: int
  dropout_rate: float = 0.0
  output_vocab_size: int = 32_000
  zero_decoder_seq: bool = False

  @nn.compact
  def __call__(self, encoded, targets, pos_emb, decoder_mask=None,
               decode=False, deterministic=True,
               max_decode_length=None):  # max_decode_length: API compat
    del max_decode_length
    tokens = targets.astype("int32")
    if not decode:  # Cache-driven decoding feeds already-shifted tokens.
      tokens = shift_right(tokens)
    vocab = nn.Embed(name="EmbedTargets",
                     embedding_init=nn.initializers.normal(stddev=1.0),
                     num_embeddings=self.output_vocab_size,
                     features=self.emb_dim)
    h = vocab(tokens)
    if self.zero_decoder_seq:
      h = jnp.zeros_like(h)
    h = common.AddPositionEmbs(decode=decode, name="PosEmbedTargets")(
        h, pos_emb)
    h = nn.Dropout(rate=self.dropout_rate)(h, deterministic)

    for layer in range(self.num_layers):
      h = EncoderDecoderBlock(
          name=f"EncDecBlock{layer}", decode=decode,
          num_heads=self.num_heads, dropout_rate=self.dropout_rate,
          mlp_dim=self.mlp_dim)(h, encoded, decoder_mask=decoder_mask,
                                deterministic=deterministic)
    head = nn.Dense(name="LogitsDense",
                    kernel_init=nn.initializers.zeros,
                    features=self.output_vocab_size)
    return head(nn.LayerNorm(name="LayerNorm")(h))


def _resolve_patch_size(patches):
  """Accepts dict/ConfigDict {"size": p}, dataclass .size, int, or tuple."""
  try:
    size = patches["size"]
  except (TypeError, KeyError, IndexError):
    size = patches if isinstance(patches, (tuple, list)) else patches.size
  return (size, size) if isinstance(size, int) else tuple(size)


class Model(nn.Module):
  """Encoder-decoder over (image, code-token) pairs."""
  patches: Any
  # Shared encoder/decoder geometry.
  num_layers: int = 6
  num_heads: int = 8
  emb_dim: int = 512
  mlp_dim: int = 2048
  dropout_rate: float = 0.0
  # Code-token LM head.
  vocab_size: int = 32_000
  seq_len: int = 256
  zero_decoder_seq: bool = False
  # Image side.
  input_size: Sequence[int] = (256, 256)
  posemb_type: str = "sincos2d"

  def setup(self):
    patch_size = _resolve_patch_size(self.patches)
    self._patch_size = patch_size
    grid = tuple(np.array(self.input_size) // np.array(patch_size))

    self.conv = nn.Conv(self.emb_dim, patch_size, padding="VALID",
                        strides=patch_size, name="EmbedPatches")
    self.pos_emb_for_encoder = vit.get_posemb(
        self, self.posemb_type, seqshape=grid, width=self.emb_dim,
        name="pos_embedding_encoder")
    self.encoder = vit.Encoder(num_heads=self.num_heads,
                               depth=self.num_layers,
                               dropout=self.dropout_rate,
                               mlp_dim=self.mlp_dim)

    self.pos_emb_for_decoder = vit.get_posemb(
        self, self.posemb_type, seqshape=(1, self.seq_len),
        width=self.emb_dim, name="pos_embedding_decoder")
    self.decoder = Decoder(
        zero_decoder_seq=self.zero_decoder_seq,
        output_vocab_size=self.vocab_size,
        dropout_rate=self.dropout_rate,
        num_layers=self.num_layers,
        num_heads=self.num_heads,
        emb_dim=self.emb_dim,
        mlp_dim=self.mlp_dim)

  def encode(self, image, train=False):
    patches = self.conv(image)
    patches = patches.reshape(*patches.shape[:1], -1, patches.shape[-1])
    memory, _ = self.encoder(patches + self.pos_emb_for_encoder,
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
    return self.decode(self.encode(image, train=train), text,
                       decode=decode, train=train)


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
  init_files = {**init_files}
  enc_init = init_files.pop("encoder", None)
  if not enc_init:
    raise ValueError(f"Only encoder init is supported: {init_files}")
  params = dict(init_params)
  as_vit = {vit_key: params[my_key] for my_key, vit_key in grafts.items()}
  loaded = vit.load(as_vit, enc_init, model_cfg={}, dont_load=dont_load)
  for my_key, vit_key in grafts.items():
    params[my_key] = loaded[vit_key]
  return params
