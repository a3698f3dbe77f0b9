"""CapPa: image captioner (ViT encoder + text decoder w/ parallel pred).

Parity target: reference models/proj/cappa/cappa.py (arxiv.org/abs/2306.07915):
shift-right AR decoding, optional masked parallel prediction
(masked_pred_prob/masking_ratio — replaces causal masking for a random
subset of examples), cross-attention decoder, scan+remat, flax decode
cache for fast AR generation. Param names match the reference.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp

import big_vision_tpu.utils as u
from big_vision_tpu.models import common, vit


def shift_right(x, axis=1, constant_values=0):
  """Shifts right along `axis`, dropping the last slice (teacher forcing)."""
  pad_widths = [(0, 0)] * x.ndim
  pad_widths[axis] = (1, 0)
  padded = jnp.pad(x, pad_widths, constant_values=constant_values)
  return padded[tuple(slice(-1 if i == axis else None)
                      for i in range(x.ndim))]


class MlpBlock(nn.Module):
  mlp_dim: Optional[int] = None
  dropout: float = 0.0
  use_bias: bool = True

  @nn.compact
  def __call__(self, x, deterministic=True):
    inits = dict(kernel_init=nn.initializers.xavier_uniform(),
                 bias_init=nn.initializers.normal(stddev=1e-6))
    d = x.shape[-1]
    x = nn.Dense(self.mlp_dim or 4 * d, use_bias=self.use_bias, **inits)(x)
    x = nn.gelu(x)
    x = nn.Dropout(rate=self.dropout)(x, deterministic)
    return nn.Dense(d, use_bias=self.use_bias, **inits)(x)


class EncoderDecoderBlock(nn.Module):
  """Self-attn (causal/cached) + cross-attn + MLP."""
  mlp_dim: int
  num_heads: int
  dropout_rate: float = 0.0
  decode: bool = False
  use_bias: bool = True

  @nn.compact
  def __call__(self, targets, encoded, decoder_mask=None,
               deterministic=True):
    def wlc(f):
      return nn.with_logical_constraint(
          f, ("act_batch", "act_len", "act_emb"))

    x = wlc(nn.LayerNorm(name="LayerNorm1", use_bias=self.use_bias)(targets))
    x = wlc(nn.MultiHeadDotProductAttention(
        num_heads=self.num_heads, use_bias=False, broadcast_dropout=False,
        dropout_rate=self.dropout_rate, decode=self.decode,
        name="SelfAttn")(x, mask=decoder_mask,
                         deterministic=deterministic))
    x = wlc(nn.Dropout(rate=self.dropout_rate)(x, deterministic))
    x = wlc(x + targets)

    if encoded is not None:
      y = wlc(nn.LayerNorm(name="LayerNorm2", use_bias=self.use_bias)(x))
      y = wlc(nn.MultiHeadDotProductAttention(
          num_heads=self.num_heads, use_bias=False,
          broadcast_dropout=False, dropout_rate=self.dropout_rate,
          name="CrossAttn")(y, encoded, deterministic=deterministic))
      y = wlc(nn.Dropout(rate=self.dropout_rate)(y, deterministic))
      y = wlc(y + x)
    else:
      y = x

    z = wlc(nn.LayerNorm(name="LayerNorm3", use_bias=self.use_bias)(y))
    z = wlc(MlpBlock(mlp_dim=self.mlp_dim, dropout=self.dropout_rate,
                     use_bias=self.use_bias, name="MLP")(z, deterministic))
    return wlc(y + z), None


class Decoder(nn.Module):
  """Text decoder with optional masked parallel prediction."""
  emb_dim: int
  mlp_dim: int
  num_heads: int
  num_layers: int
  dropout_rate: float = 0.0
  output_vocab_size: int = 32_000
  masked_pred_prob: float = 0.0
  masking_ratio: float = 0.0
  use_bias: bool = True
  scan: bool = False
  remat_policy: str = "nothing_saveable"

  @nn.compact
  def __call__(self, encoded, targets, pos_emb, decoder_mask=None,
               decode=False, deterministic=True, max_decode_length=None):
    del max_decode_length
    y = targets.astype("int32")
    if not decode:
      if self.masked_pred_prob > 0.0 and not deterministic:
        # With prob p, replace shift-right AR prediction by masked parallel
        # prediction: a fixed ratio of positions become [MASK]=vocab_size
        # and attention goes bidirectional for those examples.
        def _add_random_masks(a):
          n_masked = int(self.masking_ratio * a.shape[1])
          locs = jnp.zeros(a.shape[:2], jnp.int32).at[:, :n_masked].set(1)
          locs = jax.random.permutation(self.make_rng("dropout"), locs,
                                        axis=1, independent=True)
          return jnp.where(locs, self.output_vocab_size, a)

        def where(mask, x, yy):
          mask = mask.reshape((-1,) + (1,) * (x.ndim - 1))
          return jnp.where(mask, x, yy)

        do_masked = (jax.random.uniform(self.make_rng("dropout"),
                                        (len(y),)) < self.masked_pred_prob)
        y = where(do_masked, _add_random_masks(y), shift_right(y))
        decoder_mask = where(do_masked, jnp.ones_like(decoder_mask),
                             decoder_mask)
      else:
        y = shift_right(y)

    embed = nn.Embed(
        self.output_vocab_size + (1 if self.masked_pred_prob > 0.0 else 0),
        self.emb_dim, name="EmbedTargets",
        embedding_init=nn.initializers.normal(stddev=1.0))
    y = embed(y)
    y = common.AddPositionEmbs(decode=decode, name="PosEmbedTargets")(
        y, pos_emb)

    if self.scan:
      block = nn.remat(
          EncoderDecoderBlock, prevent_cse=False, static_argnums=(-1,),
          policy=getattr(jax.checkpoint_policies, self.remat_policy, None))
      initializing = self.is_mutable_collection("params")
      from flax.linen import partitioning
      params_spec = (1 if initializing else partitioning.ScanIn(1))
      y, _ = nn.scan(
          block,
          variable_axes={"params": params_spec, "cache": 0},
          split_rngs={"params": True, "dropout": True},
          in_axes=nn.broadcast,
          length=self.num_layers)(
              num_heads=self.num_heads, mlp_dim=self.mlp_dim,
              dropout_rate=self.dropout_rate, decode=decode,
              use_bias=self.use_bias, name="EncDecBlock")(
                  y, encoded, decoder_mask, deterministic)
    else:
      for lyr in range(self.num_layers):
        y, _ = EncoderDecoderBlock(
            num_heads=self.num_heads, mlp_dim=self.mlp_dim,
            dropout_rate=self.dropout_rate, decode=decode,
            use_bias=self.use_bias, name=f"EncDecBlock{lyr}")(
                y, encoded, decoder_mask=decoder_mask,
                deterministic=deterministic)

    y = nn.LayerNorm(name="LayerNorm")(y)
    return nn.Dense(self.output_vocab_size,
                    kernel_init=nn.initializers.zeros,
                    name="LogitsDense")(y)


class Model(nn.Module):
  """ViT encoder + captioning decoder."""
  num_heads: int = 8
  num_layers: int = 6
  mlp_dim: int = 2048
  emb_dim: int = 512
  enc_dropout_rate: float = 0.0
  vocab_size: int = 32_000
  seq_len: int = 256
  patches: Sequence[int] = (16, 16)
  input_seq_len: int = 768
  posemb_type: str = "learn"
  patch_dropout: float = 0.0
  decoder_num_heads: int = 0
  decoder_num_layers: int = 0
  decoder_mlp_dim: int = 0
  decoder_emb_dim: int = 0
  dec_dropout_rate: float = 0.0
  masked_pred_prob: float = 0.0
  masking_ratio: float = 0.0
  decoder_bias: bool = True
  scan: bool = False
  remat_policy: str = "nothing_saveable"

  def setup(self):
    self.encoder = vit.Model(
        patch_size=tuple(self.patches), width=self.emb_dim,
        depth=self.num_layers, mlp_dim=self.mlp_dim,
        num_heads=self.num_heads, dropout=self.enc_dropout_rate,
        posemb=self.posemb_type, scan=self.scan,
        remat_policy=self.remat_policy)
    self.pos_emb_for_decoder = vit.get_posemb(
        self, self.posemb_type, (1, self.seq_len),
        self.decoder_emb_dim or self.emb_dim, "pos_embedding_decoder")
    self.decoder = Decoder(
        num_layers=self.decoder_num_layers or self.num_layers,
        mlp_dim=self.decoder_mlp_dim or self.mlp_dim,
        num_heads=self.decoder_num_heads or self.num_heads,
        dropout_rate=self.dec_dropout_rate,
        emb_dim=self.decoder_emb_dim or self.emb_dim,
        output_vocab_size=self.vocab_size,
        masked_pred_prob=self.masked_pred_prob,
        masking_ratio=self.masking_ratio,
        use_bias=self.decoder_bias,
        scan=self.scan, remat_policy=self.remat_policy)

  def encode(self, image, train=False, return_enc_features=False):
    _, out = self.encoder(image, train=train)
    if return_enc_features:
      return out["encoded"], out
    return out["encoded"]

  def decode(self, encoded, targets, decode=False, train=False,
             max_decode_length=None):
    decoder_mask = None if decode else nn.make_causal_mask(targets)
    return self.decoder(
        encoded, targets, pos_emb=self.pos_emb_for_decoder,
        decoder_mask=decoder_mask, decode=decode, deterministic=not train,
        max_decode_length=max_decode_length)

  def __call__(self, image, text, *, decode=False, train=False,
               return_enc_features=False):
    if return_enc_features:
      return self.encode(image, train=train, return_enc_features=True)
    encoded = self.encode(image, train=train)
    return self.decode(encoded, text, decode=decode, train=train)


def load(init_params, init_files, model_params=None,
         dont_load=("head/kernel", "head/bias", "cls")):
  """Loads a combined checkpoint or just the encoder."""
  model_params = dict(model_params or {})
  if isinstance(init_files, str):
    import flax.training.checkpoints
    ckpt = u.load_params(init_files)
    ckpt = flax.training.checkpoints.convert_pre_linen(ckpt)
    ckpt = common.merge_params(ckpt, init_params, dont_load)
  else:
    assert set(init_files) == {"encoder"}, "Only encoder init supported"
    ckpt = flax.core.freeze(init_params).unfreeze()
    ckpt["encoder"] = vit.load(ckpt["encoder"], init_files["encoder"],
                               model_cfg={}, dont_load=dont_load)
  ckpt["encoder"]["pos_embedding"] = vit.resample_posemb(
      old=ckpt["encoder"]["pos_embedding"],
      new=init_params["encoder"]["pos_embedding"])
  return ckpt
