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


def load(init_params, init_files, model_params=None,
         dont_load=("head/kernel", "head/bias", "cls")):
  """Loads a combined checkpoint or just the encoder."""
  whole_model = isinstance(init_files, str)
  if whole_model:
    import flax.training.checkpoints
    ckpt = flax.training.checkpoints.convert_pre_linen(
        u.load_params(init_files))
    ckpt = common.merge_params(ckpt, init_params, dont_load)
  else:
    assert set(init_files) == {"encoder"}, "Only encoder init supported"
    ckpt = flax.core.freeze(init_params).unfreeze()
    ckpt["encoder"] = vit.load(ckpt["encoder"], init_files["encoder"],
                               model_cfg={}, dont_load=dont_load)
  enc = ckpt["encoder"]
  enc["pos_embedding"] = vit.resample_posemb(
      old=enc["pos_embedding"],
      new=init_params["encoder"]["pos_embedding"])
  return ckpt


def _sharded(x):
  return nn.with_logical_constraint(x, ("act_batch", "act_len", "act_emb"))


# The decoder MLP is the shared ViT one (same Dense_0/Dense_1 param
# naming); CapPa just threads use_bias through.
MlpBlock = vit.MlpBlock


def shift_right(x, axis=1, constant_values=0):
  """Shifts right along `axis`, dropping the last slice (teacher forcing)."""
  pad = [(0, 0)] * x.ndim
  pad[axis] = (1, 0)
  padded = jnp.pad(x, pad, constant_values=constant_values)
  return jax.lax.slice_in_dim(padded, 0, x.shape[axis], axis=axis)


class EncoderDecoderBlock(nn.Module):
  """Self-attn (causal/cached) + cross-attn + MLP, pre-norm residuals."""
  num_heads: int
  mlp_dim: int
  use_bias: bool = True
  decode: bool = False
  dropout_rate: float = 0.0

  def _attn(self, name, decode=False):
    return nn.MultiHeadDotProductAttention(
        name=name, decode=decode, num_heads=self.num_heads,
        dropout_rate=self.dropout_rate, use_bias=False,
        broadcast_dropout=False)

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

    ff = MlpBlock(name="MLP", mlp_dim=self.mlp_dim,
                  dropout=self.dropout_rate, use_bias=self.use_bias)
    mlp = ff(_sharded(self._norm("LayerNorm3")(x)), deterministic)
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
  def __call__(self, encoded, targets, pos_emb, *, deterministic=True,
               decoder_mask=None, decode=False,
               max_decode_length=None):  # max_decode_length: API compat
    del max_decode_length
    tokens = targets.astype("int32")
    if not decode:
      train_parallel = self.masked_pred_prob > 0.0 and not deterministic
      if not train_parallel:
        tokens = shift_right(tokens)
      else:
        tokens, decoder_mask = self._parallel_or_ar(tokens, decoder_mask)

    # One extra embedding row serves as [MASK] in parallel-pred mode.
    rows = self.output_vocab_size + int(self.masked_pred_prob > 0.0)
    vocab = nn.Embed(rows, self.emb_dim, name="EmbedTargets",
                     embedding_init=nn.initializers.normal(stddev=1.0))
    positioned = common.AddPositionEmbs(decode=decode,
                                        name="PosEmbedTargets")
    y = positioned(vocab(tokens), pos_emb)

    block_kw = dict(mlp_dim=self.mlp_dim, num_heads=self.num_heads,
                    use_bias=self.use_bias, decode=decode,
                    dropout_rate=self.dropout_rate)
    if self.scan:
      policy = getattr(jax.checkpoint_policies, self.remat_policy, None)
      block = nn.remat(EncoderDecoderBlock, static_argnums=(-1,),
                       prevent_cse=False, policy=policy)
      from flax.linen import partitioning
      params_spec = (1 if self.is_mutable_collection("params")
                     else partitioning.ScanIn(1))
      scan_kw = dict(variable_axes={"params": params_spec, "cache": 0},
                     split_rngs=dict.fromkeys(["params", "dropout"], True),
                     in_axes=nn.broadcast)
      stack = nn.scan(block, length=self.num_layers, **scan_kw)(
          name="EncDecBlock", **block_kw)
      y, _ = stack(y, encoded, decoder_mask, deterministic)
    else:
      for layer in range(self.num_layers):
        block = EncoderDecoderBlock(name=f"EncDecBlock{layer}", **block_kw)
        y, _ = block(y, encoded, decoder_mask=decoder_mask,
                     deterministic=deterministic)

    head = nn.Dense(self.output_vocab_size, name="LogitsDense",
                    kernel_init=nn.initializers.zeros)
    return head(nn.LayerNorm(name="LayerNorm")(y))


class Model(nn.Module):
  """ViT encoder + captioning decoder."""
  # Encoder geometry (decoder_* fields default to these when 0).
  emb_dim: int = 512
  mlp_dim: int = 2048
  num_layers: int = 6
  num_heads: int = 8
  input_seq_len: int = 768
  patches: Sequence[int] = (16, 16)
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
        posemb=self.posemb_type, patch_size=tuple(self.patches),
        width=self.emb_dim, mlp_dim=self.mlp_dim,
        depth=self.num_layers, num_heads=self.num_heads,
        dropout=self.enc_dropout_rate, scan=self.scan,
        remat_policy=self.remat_policy)
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
    out = self.encoder(image, train=train)[1]
    if not return_enc_features:
      return out["encoded"]
    return out["encoded"], out

  def decode(self, encoded, targets, decode=False, train=False,
             max_decode_length=None):
    causal = None if decode else nn.make_causal_mask(targets)
    return self.decoder(encoded, targets, self.pos_emb_for_decoder,
                        deterministic=not train, decoder_mask=causal,
                        decode=decode, max_decode_length=max_decode_length)

  def __call__(self, image, text, *, decode=False, train=False,
               return_enc_features=False):
    if return_enc_features:
      return self.encode(image, train=train, return_enc_features=True)
    memory = self.encode(image, train=train)
    return self.decode(memory, text, decode=decode, train=train)
