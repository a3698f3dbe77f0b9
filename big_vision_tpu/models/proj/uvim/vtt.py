"""UViM stage-II: vision-text-transformer (LM over stage-I VQ codes).

Parity target: reference models/proj/uvim/vtt.py (encoder-decoder with
flax decode cache; shift-right teacher forcing). Param names match.
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
  pad_widths = [(0, 0)] * len(x.shape)
  pad_widths[axis] = (1, 0)
  return jnp.pad(x, pad_widths, constant_values=0)[:, :-1]


class EncoderDecoderBlock(nn.Module):
  mlp_dim: int
  num_heads: int
  dropout_rate: float = 0.0
  decode: bool = False

  @nn.compact
  def __call__(self, targets, encoded, decoder_mask=None,
               deterministic=True):
    x = nn.LayerNorm(name="LayerNorm1")(targets)
    x = nn.MultiHeadDotProductAttention(
        num_heads=self.num_heads, use_bias=False, broadcast_dropout=False,
        dropout_rate=self.dropout_rate, decode=self.decode,
        name="SelfAttn")(x, mask=decoder_mask, deterministic=deterministic)
    x = nn.Dropout(rate=self.dropout_rate)(x, deterministic)
    x = x + targets

    y = nn.LayerNorm(name="LayerNorm2")(x)
    y = nn.MultiHeadDotProductAttention(
        num_heads=self.num_heads, use_bias=False, broadcast_dropout=False,
        dropout_rate=self.dropout_rate, name="CrossAttn")(
            y, encoded, deterministic=deterministic)
    y = nn.Dropout(rate=self.dropout_rate)(y, deterministic)
    y = y + x

    z = nn.LayerNorm(name="LayerNorm3")(y)
    z = vit.MlpBlock(mlp_dim=self.mlp_dim, dropout=self.dropout_rate,
                     name="MLP")(z, deterministic)
    return y + z


class Decoder(nn.Module):
  emb_dim: int
  mlp_dim: int
  num_heads: int
  num_layers: int
  dropout_rate: float = 0.0
  output_vocab_size: int = 32_000
  zero_decoder_seq: bool = False

  @nn.compact
  def __call__(self, encoded, targets, pos_emb, decoder_mask=None,
               decode=False, deterministic=True, max_decode_length=None):
    del max_decode_length
    y = targets.astype("int32")
    if not decode:
      y = shift_right(y)
    y = nn.Embed(self.output_vocab_size, self.emb_dim, name="EmbedTargets",
                 embedding_init=nn.initializers.normal(stddev=1.0))(y)
    if self.zero_decoder_seq:
      y = jnp.zeros_like(y)
    y = common.AddPositionEmbs(decode=decode, name="PosEmbedTargets")(
        y, pos_emb)
    y = nn.Dropout(rate=self.dropout_rate)(y, deterministic)

    for lyr in range(self.num_layers):
      y = EncoderDecoderBlock(
          num_heads=self.num_heads, mlp_dim=self.mlp_dim,
          dropout_rate=self.dropout_rate, decode=decode,
          name=f"EncDecBlock{lyr}")(y, encoded, decoder_mask=decoder_mask,
                                    deterministic=deterministic)
    y = nn.LayerNorm(name="LayerNorm")(y)
    return nn.Dense(self.output_vocab_size,
                    kernel_init=nn.initializers.zeros,
                    name="LogitsDense")(y)


class Model(nn.Module):
  """Encoder-decoder over (image, code-token) pairs."""
  patches: Any
  num_heads: int = 8
  num_layers: int = 6
  mlp_dim: int = 2048
  dropout_rate: float = 0.0
  emb_dim: int = 512
  vocab_size: int = 32_000
  seq_len: int = 256
  input_size: Sequence[int] = (256, 256)
  posemb_type: str = "sincos2d"
  zero_decoder_seq: bool = False

  def setup(self):
    try:
      patch_size = self.patches["size"]  # dict / FrozenDict / ConfigDict
    except (TypeError, KeyError, IndexError):
      patch_size = (self.patches if isinstance(self.patches, (tuple, list))
                    else self.patches.size)  # plain tuple or dataclass
    patch_size = ((patch_size, patch_size)
                  if isinstance(patch_size, int) else tuple(patch_size))
    self._patch_size = patch_size
    grid_size = np.array(self.input_size) // np.array(patch_size)
    self.pos_emb_for_encoder = vit.get_posemb(
        self, self.posemb_type, tuple(grid_size), self.emb_dim,
        "pos_embedding_encoder")
    self.pos_emb_for_decoder = vit.get_posemb(
        self, self.posemb_type, (1, self.seq_len), self.emb_dim,
        "pos_embedding_decoder")
    self.encoder = vit.Encoder(depth=self.num_layers, mlp_dim=self.mlp_dim,
                               num_heads=self.num_heads,
                               dropout=self.dropout_rate)
    self.decoder = Decoder(
        num_layers=self.num_layers, mlp_dim=self.mlp_dim,
        num_heads=self.num_heads, dropout_rate=self.dropout_rate,
        emb_dim=self.emb_dim, output_vocab_size=self.vocab_size,
        zero_decoder_seq=self.zero_decoder_seq)
    self.conv = nn.Conv(self.emb_dim, patch_size, padding="VALID",
                        strides=patch_size, name="EmbedPatches")

  def encode(self, image, train=False):
    emb = self.conv(image)
    emb = emb.reshape(emb.shape[0], -1, emb.shape[-1])
    encoded, _ = self.encoder(emb + self.pos_emb_for_encoder,
                              deterministic=not train)
    return encoded

  def decode(self, encoded, targets, decode=False, train=False,
             max_decode_length=None):
    decoder_mask = None if decode else nn.make_causal_mask(targets)
    return self.decoder(
        encoded, targets, pos_emb=self.pos_emb_for_decoder,
        decoder_mask=decoder_mask, decode=decode, deterministic=not train,
        max_decode_length=max_decode_length)

  def __call__(self, image, text, *, decode=False, train=False):
    encoded = self.encode(image, train=train)
    return self.decode(encoded, text, decode=decode, train=train)


def load(init_params, init_files, model_params=None,
         dont_load=("head/kernel", "head/bias", "cls")):
  """Loads a full VTT checkpoint or just its ViT encoder."""
  del model_params
  import flax.training.checkpoints
  if isinstance(init_files, str):
    ckpt_params = u.load_params(init_files)
    ckpt_params = flax.training.checkpoints.convert_pre_linen(ckpt_params)
    if init_params is not None:
      ckpt_params = common.merge_params(ckpt_params, init_params,
                                        dont_load)
  else:
    init_files = {**init_files}
    enc_init = init_files.pop("encoder", None)
    if not enc_init:
      raise ValueError(f"Only encoder init is supported: {init_files}")
    ckpt_params = dict(init_params)
    vit_params = {
        "pos_embedding": ckpt_params["pos_embedding_encoder"],
        "Transformer": ckpt_params["encoder"],
        "embedding": ckpt_params["EmbedPatches"],
    }
    encoder_params = vit.load(vit_params, enc_init, model_cfg={},
                              dont_load=dont_load)
    ckpt_params["encoder"] = encoder_params["Transformer"]
    ckpt_params["pos_embedding_encoder"] = encoder_params["pos_embedding"]
    ckpt_params["EmbedPatches"] = encoder_params["embedding"]
  return ckpt_params
