"""GIVT: generative infinite-vocabulary transformer over continuous tokens.

Parity target: reference models/proj/givt/givt.py (arxiv.org/abs/2312.02116):
decoder-only or encoder-decoder transformer whose output head parameterizes
a GMM over CONTINUOUS (VAE-latent) tokens; causal "ar" and MaskGIT-style
"masked" modes; classifier-free guidance via label dropping; square-plus
scale activation. Distributions come from distributions.py (distrax-free).
"""

from __future__ import annotations

import enum
import itertools
from typing import Literal, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.models import common, vit
from big_vision_tpu.models.proj.givt import distributions


class _SpecialLabel(enum.Enum):
  MASK = "mask"
  NOMASK = "nomask"
  REPLACE = "replace"
  NOLABEL = "nolabel"


def _random_mask_with_ratios(rng, ratios, seq_len):
  """bool [B, L]: True = masked; per-example mask counts = ratio*L."""
  b = ratios.shape[0]
  n_masked = jnp.round(ratios * seq_len).astype(jnp.int32)
  scores = jax.random.uniform(rng, (b, seq_len))
  order = jnp.argsort(scores, axis=-1)
  ranks = jnp.argsort(order, axis=-1)
  return ranks < n_masked[:, None]


def apply_mask_schedule(ratio, method="cosine"):
  """Maps progress in [0,1] to a masking ratio."""
  if method == "cosine":
    return jnp.cos(ratio * jnp.pi / 2)
  if method == "linear":
    return 1.0 - ratio
  raise ValueError(f"Unknown mask schedule {method!r}")


class EncoderDecoderBlock(nn.Module):
  mlp_dim: int
  num_heads: int
  dropout_rate: float = 0.0
  decode: bool = False

  @nn.compact
  def __call__(self, targets, encoded=None, decoder_mask=None,
               deterministic=True):
    def wlc(f):
      return nn.with_logical_constraint(
          f, ("act_batch", "act_len", "act_emb"))

    x = wlc(nn.LayerNorm(name="LayerNorm1", use_bias=False)(targets))
    x = wlc(nn.MultiHeadDotProductAttention(
        num_heads=self.num_heads, use_bias=False, broadcast_dropout=False,
        dropout_rate=self.dropout_rate, decode=self.decode,
        name="SelfAttn")(x, mask=decoder_mask,
                         deterministic=deterministic))
    x = wlc(nn.Dropout(rate=self.dropout_rate)(x, deterministic))
    x = wlc(x + targets)

    if encoded is None:
      y = x
    else:
      y = wlc(nn.LayerNorm(name="LayerNorm2", use_bias=False)(x))
      y = wlc(nn.MultiHeadDotProductAttention(
          num_heads=self.num_heads, use_bias=False,
          broadcast_dropout=False, dropout_rate=self.dropout_rate,
          name="CrossAttn")(y, encoded, deterministic=deterministic))
      y = wlc(nn.Dropout(rate=self.dropout_rate)(y, deterministic))
      y = wlc(y + x)

    z = wlc(nn.LayerNorm(name="LayerNorm3", use_bias=False)(y))
    z = wlc(vit.MlpBlock(mlp_dim=self.mlp_dim, dropout=self.dropout_rate,
                         name="MLP")(z, deterministic))
    out = wlc(y + z)
    return out, out


class Decoder(nn.Module):
  emb_dim: int
  mlp_dim: int
  num_heads: int
  num_layers: int
  out_dim: int
  seq_len: int
  style: Literal["ar", "masked"]
  dropout_rate: float = 0.0
  zero_embedding_init: bool = False
  scan: bool = False
  remat_policy: str = "nothing_saveable"

  @nn.compact
  def __call__(self, targets, encoded=None, decoder_mask=None, decode=False,
               deterministic=True, return_reps=False):
    if self.style == "masked" and decode:
      raise ValueError("Masked models have no decode cache")

    pos_emb = vit.get_posemb(self, "learn", (1, self.seq_len),
                             self.emb_dim, "pos_emb")
    y = common.AddPositionEmbs(decode=decode, name="PosEmbedTargets")(
        targets, pos_emb)

    out = {}
    if self.scan:
      block = nn.remat(
          EncoderDecoderBlock, prevent_cse=False, static_argnums=(-1,),
          policy=getattr(jax.checkpoint_policies, self.remat_policy, None))
      from flax.linen import partitioning
      initializing = self.is_mutable_collection("params")
      params_spec = (1 if initializing else partitioning.ScanIn(1))
      y, reps = nn.scan(
          block,
          variable_axes={"params": params_spec, "cache": 0},
          split_rngs={"params": True, "dropout": True},
          in_axes=nn.broadcast,
          length=self.num_layers)(
              num_heads=self.num_heads, mlp_dim=self.mlp_dim,
              dropout_rate=self.dropout_rate, decode=decode,
              name="EncDecBlock")(y, encoded, decoder_mask, deterministic)
      out = {f"block{l}_rep": jnp.mean(reps[l], axis=1)
             for l in range(self.num_layers)}
    else:
      for lyr in range(self.num_layers):
        y, _ = EncoderDecoderBlock(
            num_heads=self.num_heads, mlp_dim=self.mlp_dim,
            dropout_rate=self.dropout_rate, decode=decode,
            name=f"EncDecBlock{lyr}")(y, encoded,
                                      decoder_mask=decoder_mask,
                                      deterministic=deterministic)
        out[f"block{lyr}_rep"] = jnp.mean(y, axis=1)

    y = nn.LayerNorm(name="LayerNorm")(y)
    out["pre_logits"] = jnp.mean(y, axis=1)
    logits = nn.Dense(self.out_dim, kernel_init=nn.initializers.zeros,
                      name="LogitsDense")(y)
    out["logits"] = logits
    if return_reps:
      return logits, out
    return logits


class Model(nn.Module):
  """GIVT (decoder-only when num_layers=0)."""
  num_heads: int = 8
  num_layers: int = 0  # 0 = no encoder
  num_decoder_layers: int = 6
  mlp_dim: int = 2048
  enc_dropout_rate: float = 0.0
  dec_dropout_rate: float = 0.0
  emb_dim: int = 512
  num_labels: Optional[int] = 1000
  seq_len: int = 256
  patches: Sequence[int] = (16, 16)
  input_size: Sequence[int] = (256, 256)
  posemb_type: Literal["learn", "sincos2d"] = "learn"
  zero_decoder_seq: bool = False
  style: Literal["ar", "masked"] = "ar"
  zero_embedding_init: bool = False
  num_mixtures: int = 4
  multivariate: bool = False
  out_dim: int = 32
  scale_tol: float = 1e-6
  mask_schedule_train: str = "cosine"
  min_masking_rate_training: float = 0.3
  mask_style: str = "replace"
  drop_labels_probability: float = 0.0
  fix_square_plus: bool = False
  per_channel_mixtures: bool = True
  scan: bool = False
  remat_policy: str = "nothing_saveable"

  @property
  def has_encoder(self):
    return self.num_layers > 0

  @property
  def num_logits(self):
    if self.multivariate:
      assert self.num_mixtures == 1
      return round(self.out_dim ** 2) + self.out_dim
    if self.per_channel_mixtures:
      return 3 * self.num_mixtures * self.out_dim
    return self.num_mixtures + 2 * self.num_mixtures * self.out_dim

  def setup(self):
    assert self.posemb_type == "learn"
    assert self.num_mixtures > 0
    if self.multivariate and self.num_mixtures != 1:
      raise ValueError("Multivariate requires num_mixtures == 1")

    if self.num_layers > 0:
      grid_size = np.array(self.input_size) // np.array(self.patches)
      self.pos_emb_for_encoder = vit.get_posemb(
          self, self.posemb_type, tuple(grid_size), self.emb_dim,
          "pos_embedding_encoder")
      self.conv = nn.Conv(self.emb_dim, tuple(self.patches),
                          padding="VALID", strides=tuple(self.patches),
                          name="EmbedPatches")
      self.encoder = vit.Encoder(
          depth=self.num_layers, mlp_dim=self.mlp_dim,
          num_heads=self.num_heads, dropout=self.enc_dropout_rate,
          scan=self.scan, remat_policy=self.remat_policy)
    else:
      self.encoder = None

    next_label = itertools.count(self.num_labels or 0)
    special_labels = {}
    if self.style == "masked":
      if self.mask_style == "replace":
        special_labels = {_SpecialLabel.MASK: next(next_label)}
      elif self.mask_style == "concat":
        special_labels = {
            _SpecialLabel.MASK: next(next_label),
            _SpecialLabel.NOMASK: next(next_label),
            _SpecialLabel.REPLACE: next(next_label)}
      else:
        raise NotImplementedError(self.mask_style)
    if self.drop_labels_probability > 0:
      special_labels[_SpecialLabel.NOLABEL] = next(next_label)
    self.special_labels = special_labels

    lookup_size = (self.num_labels or 1) + len(self.special_labels)
    self.labels_emb = nn.Embed(
        lookup_size, self.emb_dim, name="EmbedLabels",
        embedding_init=(nn.initializers.zeros if self.zero_embedding_init
                        else nn.initializers.normal(stddev=1.0)))
    self.targets_emb = nn.Dense(self.emb_dim, name="EmbedTargets")
    self.decoder = Decoder(
        num_layers=self.num_decoder_layers or self.num_layers,
        mlp_dim=self.mlp_dim, num_heads=self.num_heads,
        out_dim=self.num_logits,
        seq_len=self.seq_len + int(self.style == "masked"),
        dropout_rate=self.dec_dropout_rate, emb_dim=self.emb_dim,
        zero_embedding_init=self.zero_embedding_init, style=self.style,
        scan=self.scan, remat_policy=self.remat_policy)

  def encode(self, image, train=False):
    emb = self.conv(image)
    emb = emb.reshape(emb.shape[0], -1, emb.shape[-1])
    encoded, _ = self.encoder(emb + self.pos_emb_for_encoder,
                              deterministic=not train)
    return encoded

  def embed_labels(self, labels=None, batch_size=None):
    if labels is not None:
      return self.labels_emb(labels)[:, None, :]
    assert ((self.num_labels == 1 or self.num_labels is None)
            and batch_size is not None)
    return self.labels_emb(jnp.zeros((batch_size,), jnp.int32))[:, None, :]

  def prefill(self, labels=None, batch_size=None, encoded=None,
              drop_labels=None):
    labels = self._drop_labels(drop_labels, labels)
    lab = self.embed_labels(labels=labels, batch_size=batch_size)
    return self.decoder(lab, encoded=encoded, decode=True)

  def _decode_ar(self, targets, labels=None, encoded=None, decode=False,
                 train=False):
    targets_embedded = self.targets_emb(targets)
    if decode:
      decoder_mask = None
    else:
      decoder_mask = nn.make_causal_mask(targets[:, :, 0])
      b = targets.shape[0]
      labels_embedded = self.embed_labels(labels, b)
      targets_embedded = jnp.concatenate(
          [labels_embedded, targets_embedded[:, :-1]], axis=1)
    return self.decoder(targets_embedded, encoded=encoded,
                        decoder_mask=decoder_mask, decode=decode,
                        deterministic=not train, return_reps=True)

  def _get_special_label(self, size, label):
    return self.labels_emb(
        jnp.full(size, self.special_labels[label], jnp.int32))

  def _decode_masked(self, targets, input_mask, labels=None, encoded=None,
                     train=False):
    b, s, _ = targets.shape
    assert input_mask.shape == (b, s)
    if self.mask_style == "replace":
      targets_embedded = jnp.where(
          input_mask[:, :, None],
          self._get_special_label((b, s), _SpecialLabel.MASK),
          self.targets_emb(targets))
    elif self.mask_style == "concat":
      masks = jnp.where(
          input_mask[:, :, None],
          self._get_special_label((b, s), _SpecialLabel.MASK),
          self._get_special_label((b, s), _SpecialLabel.NOMASK))
      embedded = self.targets_emb(targets)
      replaced = jnp.where(
          input_mask[:, :, None],
          self._get_special_label((b, s), _SpecialLabel.REPLACE), embedded)
      targets_embedded = jnp.concatenate(
          [masks[..., ::2], replaced[..., ::2]], axis=-1)
    else:
      raise ValueError(self.mask_style)

    labels_embedded = self.embed_labels(labels, b)
    targets_embedded = jnp.concatenate([labels_embedded, targets_embedded],
                                       axis=1)
    logits = self.decoder(targets_embedded, encoded=encoded,
                          decoder_mask=None, decode=False,
                          deterministic=not train)
    return logits[:, 1:, ...]

  def _drop_labels(self, drop_labels_mask, labels):
    if labels is None:
      return None
    if self.drop_labels_probability >= 0.999:
      return jnp.full_like(labels,
                           self.special_labels[_SpecialLabel.NOLABEL])
    if drop_labels_mask is None:
      return labels
    nolabel = jnp.full_like(labels,
                            self.special_labels[_SpecialLabel.NOLABEL])
    return jnp.where(drop_labels_mask, nolabel, labels)

  def decode(self, targets, labels=None, encoded=None, decode=False,
             train=False, max_decode_length=None, input_mask=None,
             drop_labels=None, return_reps=False):
    del max_decode_length
    labels = self._drop_labels(drop_labels, labels)
    if self.style == "ar":
      logits, out = self._decode_ar(targets, labels, encoded, decode,
                                    train)
      return (logits, out) if return_reps else logits
    if self.style == "masked":
      assert not decode and input_mask is not None and not return_reps
      return self._decode_masked(targets, input_mask, labels, encoded,
                                 train)
    raise NotImplementedError(self.style)

  def _square_plus(self, x):
    if self.fix_square_plus:
      return (x + jnp.sqrt(jnp.square(x) + 4)) / 2
    return x + jnp.sqrt(jnp.square(x) + 4) / 2

  def get_pdf(self, logits, temperature_scales=None,
              temperature_probs=None):
    assert logits.shape[-1] == self.num_logits
    if self.multivariate:
      scales = self._square_plus(logits[..., :self.out_dim ** 2])
      locs = logits[..., self.out_dim ** 2:]
      *lead, _ = scales.shape
      scales = scales.reshape(*lead, self.out_dim, self.out_dim)
      scales = jnp.maximum(scales, jnp.eye(self.out_dim) * self.scale_tol)
      if temperature_scales is not None:
        scales = scales * temperature_scales
      return distributions.MultivariateNormalTri(locs, scales)

    if self.per_channel_mixtures:
      logits = jnp.reshape(logits,
                           logits.shape[:-1] + (-1, self.num_mixtures))
      probs, locs, scales = jnp.split(logits, 3, axis=-2)
      if temperature_probs is not None:
        probs = probs * temperature_probs
      probs = jax.nn.softmax(probs)
      scales = jnp.maximum(self._square_plus(scales), self.scale_tol)
      if temperature_scales is not None:
        scales = scales * temperature_scales
      return distributions.PerChannelMixture(probs, locs, scales)

    *shape, _ = logits.shape
    prob_logits = logits[..., :self.num_mixtures]
    other = logits[..., self.num_mixtures:].reshape(
        (*shape, self.num_mixtures, 2, self.out_dim))
    if temperature_probs is not None:
      prob_logits = prob_logits * temperature_probs
    locs = other[..., 0, :]
    scales = jnp.maximum(self._square_plus(other[..., 1, :]),
                         self.scale_tol)
    if temperature_scales is not None:
      scales = scales * temperature_scales
    return distributions.DiagMixture(prob_logits, locs, scales)

  def __call__(self, sequence, labels=None, *, image=None, decode=False,
               input_mask=None, drop_labels=None, train=False):
    if self.style == "masked" and input_mask is None:
      raise ValueError("Masked model requires input_mask")
    if self.encoder is not None:
      assert image is not None
      encoded = self.encode(image, train=train)
    else:
      assert image is None
      encoded = None
    logits = self.decode(sequence, labels=labels, encoded=encoded,
                         decode=decode, input_mask=input_mask, train=train)
    return logits, self.get_pdf(logits)

  def get_input_mask_training(self, rng, shape):
    if self.style == "ar":
      return None
    b, s = shape
    keep = jax.random.uniform(
        rng, (b,), maxval=1.0 - self.min_masking_rate_training)
    ratio = apply_mask_schedule(keep, self.mask_schedule_train)
    return _random_mask_with_ratios(rng, ratios=ratio, seq_len=s)

  def get_input_mask_teacher_forced(self, shape):
    if self.style == "ar":
      return None
    return jnp.zeros(shape, bool)

  def get_drop_labels(self, rng, batch_size):
    if (p := self.drop_labels_probability) > 0:
      return jax.random.uniform(rng, (batch_size,)) <= p
    return None


def load(init_params, init_files, model_params=None, dont_load=(),
         resample_encoder_posemb=False, trim_decoder_posemb=False):
  del model_params
  assert isinstance(init_files, str), "Composite init not supported yet"
  ckpt = u.load_params(init_files)
  ckpt = common.merge_params(ckpt, init_params, dont_load)
  if resample_encoder_posemb and init_params:
    if "pos_embedding_encoder" in init_params:
      ckpt["pos_embedding_encoder"] = vit.resample_posemb(
          old=ckpt["pos_embedding_encoder"],
          new=init_params["pos_embedding_encoder"])
  if trim_decoder_posemb and init_params:
    if "pos_embedding_decoder" in init_params:
      ckpt["pos_embedding_decoder"] = ckpt["pos_embedding_decoder"][
          :, :init_params["pos_embedding_decoder"].shape[1], :]
  return ckpt
