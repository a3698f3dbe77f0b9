"""CapPa: image captioner (ViT encoder + text decoder w/ parallel pred).

Behavior parity: reference models/proj/cappa/cappa.py
(arxiv.org/abs/2306.07915): shift-right AR decoding, optional masked
parallel prediction (with prob `masked_pred_prob` an example is trained
with `masking_ratio` of its positions replaced by [MASK]=vocab_size and
bidirectional attention instead of causal), cross-attention decoder,
scan+remat over decoder layers, flax decode cache for AR generation.
Param tree names match the reference so CapPa checkpoints load unmodified.
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
  pad = [(0, 0)] * x.ndim
  pad[axis] = (1, 0)
  keep = tuple(slice(-1 if i == axis else None) for i in range(x.ndim))
  return jnp.pad(x, pad, constant_values=constant_values)[keep]


def _sharded(x):
  return nn.with_logical_constraint(x, ("act_batch", "act_len", "act_emb"))


# The decoder MLP is the shared ViT one (same Dense_0/Dense_1 param
# naming); CapPa just threads use_bias through.
MlpBlock = vit.MlpBlock


class EncoderDecoderBlock(nn.Module):
  """Self-attn (causal/cached) + cross-attn + MLP, pre-norm residuals."""
  mlp_dim: int
  num_heads: int
  dropout_rate: float = 0.0
  decode: bool = False
  use_bias: bool = True

  def _attn(self, name, decode=False):
    return nn.MultiHeadDotProductAttention(
        num_heads=self.num_heads, use_bias=False, broadcast_dropout=False,
        dropout_rate=self.dropout_rate, decode=decode, name=name)

  def _norm(self, name):
    return nn.LayerNorm(name=name, use_bias=self.use_bias)

  @nn.compact
  def __call__(self, tokens, encoded, decoder_mask=None,
               deterministic=True):
    drop = nn.Dropout(rate=self.dropout_rate)

    sa = self._attn("SelfAttn", decode=self.decode)(
        _sharded(self._norm("LayerNorm1")(tokens)),
        mask=decoder_mask, deterministic=deterministic)
    x = _sharded(tokens + drop(_sharded(sa), deterministic))

    # Image-free operation (encoded=None) is used by scoring paths.
    if encoded is not None:
      ca = self._attn("CrossAttn")(
          _sharded(self._norm("LayerNorm2")(x)), encoded,
          deterministic=deterministic)
      x = _sharded(x + drop(_sharded(ca), deterministic))

    mlp = MlpBlock(mlp_dim=self.mlp_dim, dropout=self.dropout_rate,
                   use_bias=self.use_bias, name="MLP")(
                       _sharded(self._norm("LayerNorm3")(x)), deterministic)
    return _sharded(x + _sharded(mlp)), None


class Decoder(nn.Module):
  """Text decoder with optional masked parallel prediction."""
  num_layers: int
  num_heads: int
  emb_dim: int
  mlp_dim: int
  dropout_rate: float = 0.0
  output_vocab_size: int = 32_000
  masked_pred_prob: float = 0.0
  masking_ratio: float = 0.0
  use_bias: bool = True
  scan: bool = False
  remat_policy: str = "nothing_saveable"

  def _parallel_or_ar(self, tokens, decoder_mask):
    """Per example: masked parallel prediction (prob p) or AR shift-right.

    Parallel examples get `masking_ratio` of their positions replaced by
    the [MASK] id (==vocab_size) and a fully-visible attention mask.
    """
    n_mask = int(self.masking_ratio * tokens.shape[1])
    slots = jnp.zeros(tokens.shape[:2], jnp.int32).at[:, :n_mask].set(1)
    slots = jax.random.permutation(self.make_rng("dropout"), slots,
                                   axis=1, independent=True)
    masked = jnp.where(slots, self.output_vocab_size, tokens)

    parallel = (jax.random.uniform(self.make_rng("dropout"),
                                   (len(tokens),)) < self.masked_pred_prob)
    pick = lambda flag, a, b: jnp.where(
        flag.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)
    return (pick(parallel, masked, shift_right(tokens)),
            pick(parallel, jnp.ones_like(decoder_mask), decoder_mask))

  @nn.compact
  def __call__(self, encoded, targets, pos_emb, decoder_mask=None,
               decode=False, deterministic=True,
               max_decode_length=None):  # max_decode_length: API compat
    del max_decode_length
    tokens = targets.astype("int32")
    if not decode:
      if self.masked_pred_prob > 0.0 and not deterministic:
        tokens, decoder_mask = self._parallel_or_ar(tokens, decoder_mask)
      else:
        tokens = shift_right(tokens)

    has_mask_token = int(self.masked_pred_prob > 0.0)
    y = nn.Embed(self.output_vocab_size + has_mask_token, self.emb_dim,
                 name="EmbedTargets",
                 embedding_init=nn.initializers.normal(stddev=1.0))(tokens)
    y = common.AddPositionEmbs(decode=decode, name="PosEmbedTargets")(
        y, pos_emb)

    block_kw = dict(num_heads=self.num_heads, mlp_dim=self.mlp_dim,
                    dropout_rate=self.dropout_rate, decode=decode,
                    use_bias=self.use_bias)
    if self.scan:
      policy = getattr(jax.checkpoint_policies, self.remat_policy, None)
      block = nn.remat(EncoderDecoderBlock, static_argnums=(-1,),
                       prevent_cse=False, policy=policy)
      from flax.linen import partitioning
      params_spec = (1 if self.is_mutable_collection("params")
                     else partitioning.ScanIn(1))
      y, _ = nn.scan(
          block,
          variable_axes={"params": params_spec, "cache": 0},
          split_rngs={"params": True, "dropout": True},
          in_axes=nn.broadcast,
          length=self.num_layers)(name="EncDecBlock", **block_kw)(
              y, encoded, decoder_mask, deterministic)
    else:
      for layer in range(self.num_layers):
        y, _ = EncoderDecoderBlock(name=f"EncDecBlock{layer}",
                                   **block_kw)(
                                       y, encoded,
                                       decoder_mask=decoder_mask,
                                       deterministic=deterministic)

    return nn.Dense(self.output_vocab_size,
                    kernel_init=nn.initializers.zeros,
                    name="LogitsDense")(nn.LayerNorm(name="LayerNorm")(y))


class Model(nn.Module):
  """ViT encoder + captioning decoder."""
  # Encoder geometry (decoder_* fields default to these when 0).
  num_layers: int = 6
  num_heads: int = 8
  emb_dim: int = 512
  mlp_dim: int = 2048
  patches: Sequence[int] = (16, 16)
  input_seq_len: int = 768
  posemb_type: str = "learn"
  enc_dropout_rate: float = 0.0
  patch_dropout: float = 0.0
  # Decoder geometry + captioning head.
  vocab_size: int = 32_000
  seq_len: int = 256
  decoder_num_layers: int = 0
  decoder_num_heads: int = 0
  decoder_emb_dim: int = 0
  decoder_mlp_dim: int = 0
  dec_dropout_rate: float = 0.0
  decoder_bias: bool = True
  # Parallel prediction (arXiv:2306.07915 sec 3).
  masked_pred_prob: float = 0.0
  masking_ratio: float = 0.0
  # Compilation knobs.
  scan: bool = False
  remat_policy: str = "nothing_saveable"

  def setup(self):
    self.encoder = vit.Model(
        width=self.emb_dim, patch_size=tuple(self.patches),
        num_heads=self.num_heads, depth=self.num_layers,
        posemb=self.posemb_type, dropout=self.enc_dropout_rate,
        remat_policy=self.remat_policy, scan=self.scan,
        mlp_dim=self.mlp_dim)
    # Decoder geometry defaults to the encoder's unless overridden.
    self.pos_emb_for_decoder = vit.get_posemb(
        self, self.posemb_type, seqshape=(1, self.seq_len),
        width=self.decoder_emb_dim or self.emb_dim,
        name="pos_embedding_decoder")
    fallback = lambda mine, enc: mine or enc
    self.decoder = Decoder(
        output_vocab_size=self.vocab_size,
        use_bias=self.decoder_bias,
        masking_ratio=self.masking_ratio,
        masked_pred_prob=self.masked_pred_prob,
        dropout_rate=self.dec_dropout_rate,
        num_layers=fallback(self.decoder_num_layers, self.num_layers),
        num_heads=fallback(self.decoder_num_heads, self.num_heads),
        emb_dim=fallback(self.decoder_emb_dim, self.emb_dim),
        mlp_dim=fallback(self.decoder_mlp_dim, self.mlp_dim),
        remat_policy=self.remat_policy, scan=self.scan)

  def encode(self, image, train=False, return_enc_features=False):
    _, out = self.encoder(image, train=train)
    if return_enc_features:
      return out["encoded"], out
    return out["encoded"]

  def decode(self, encoded, targets, decode=False, train=False,
             max_decode_length=None):
    return self.decoder(
        encoded, targets, pos_emb=self.pos_emb_for_decoder,
        decoder_mask=None if decode else nn.make_causal_mask(targets),
        decode=decode, deterministic=not train,
        max_decode_length=max_decode_length)

  def __call__(self, image, text, *, decode=False, train=False,
               return_enc_features=False):
    if return_enc_features:
      return self.encode(image, train=train, return_enc_features=True)
    return self.decode(self.encode(image, train=train), text,
                       decode=decode, train=train)


def load(init_params, init_files, model_params=None,
         dont_load=("head/kernel", "head/bias", "cls")):
  """Loads a combined checkpoint or just the encoder."""
  if isinstance(init_files, str):
    import flax.training.checkpoints
    ckpt = flax.training.checkpoints.convert_pre_linen(
        u.load_params(init_files))
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
