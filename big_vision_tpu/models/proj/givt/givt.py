"""GIVT: generative infinite-vocabulary transformer over continuous tokens.

Parity target: reference models/proj/givt/givt.py (arxiv.org/abs/2312.02116):
decoder-only or encoder-decoder transformer whose output head parameterizes
a GMM over CONTINUOUS (VAE-latent) tokens; causal "ar" and MaskGIT-style
"masked" modes; classifier-free guidance via label dropping; square-plus
scale activation.

TPU-first notes: the GMM head builders live in distributions.py (distrax-
free, shared with jetformer); masked-training masks come from one argsort
rank comparison instead of per-example top-k; the decoder reuses vit's
MlpBlock and the flax decode cache for AR sampling.
"""

from __future__ import annotations

import itertools
from typing import Literal, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.models import common, vit
from big_vision_tpu.models.proj.givt import distributions


# Special conditioning tokens, appended to the label vocabulary. Plain
# strings: they only ever key the special_labels id map.
MASK, NOMASK, REPLACE, NOLABEL = "mask", "nomask", "replace", "nolabel"


def _random_mask_with_ratios(rng, ratios, seq_len):
  """bool [B, L]: True = masked; per-example mask counts = ratio*L.

  One argsort over uniform scores yields, per example, a uniformly random
  rank permutation; comparing ranks against the per-example count masks a
  uniform subset of exactly that size (no per-example top_k).
  """
  b = ratios.shape[0]
  n_masked = jnp.round(ratios * seq_len).astype(jnp.int32)
  scores = jax.random.uniform(rng, (b, seq_len))
  ranks = jnp.argsort(jnp.argsort(scores, axis=-1), axis=-1)
  return ranks < n_masked[:, None]


def apply_mask_schedule(ratio, method="cosine"):
  """Maps progress in [0,1] to a masking ratio."""
  if method == "cosine":
    return jnp.cos(ratio * jnp.pi / 2)
  if method == "linear":
    return 1.0 - ratio
  raise ValueError(f"Unknown mask schedule {method!r}")


def _wlc(x):
  return nn.with_logical_constraint(x, ("act_batch", "act_len", "act_emb"))


class EncoderDecoderBlock(nn.Module):
  """Pre-LN block: self-attention, optional cross-attention, MLP.

  Param names (LayerNorm1/2/3, SelfAttn, CrossAttn, MLP) pin the reference
  checkpoint layout (ref givt.py:96-160).
  """
  mlp_dim: int
  num_heads: int
  dropout_rate: float = 0.0
  decode: bool = False

  def _attn(self, name, decode=False):
    return nn.MultiHeadDotProductAttention(
        num_heads=self.num_heads, dropout_rate=self.dropout_rate,
        decode=decode, use_bias=False, broadcast_dropout=False, name=name)

  @nn.compact
  def __call__(self, targets, encoded=None, decoder_mask=None,
               deterministic=True):
    drop = nn.Dropout(rate=self.dropout_rate)

    def residual(x, i, branch):
      ln = nn.LayerNorm(name=f"LayerNorm{i}", use_bias=False)
      return _wlc(x + drop(_wlc(branch(_wlc(ln(x)))), deterministic))

    x = residual(targets, 1, lambda h: self._attn(
        "SelfAttn", decode=self.decode)(h, mask=decoder_mask,
                                        deterministic=deterministic))
    if encoded is not None:
      x = residual(x, 2, lambda h: self._attn("CrossAttn")(
          h, encoded, deterministic=deterministic))
    mlp = vit.MlpBlock(mlp_dim=self.mlp_dim, dropout=self.dropout_rate,
                       name="MLP")
    out = residual(x, 3, lambda h: mlp(h, deterministic))
    return out, out


class Decoder(nn.Module):
  """Stack of EncoderDecoderBlocks with learned posemb and GMM-raw head."""
  style: Literal["ar", "masked"]
  seq_len: int
  out_dim: int
  emb_dim: int
  num_layers: int
  num_heads: int
  mlp_dim: int
  dropout_rate: float = 0.0
  scan: bool = False
  remat_policy: str = "nothing_saveable"
  zero_embedding_init: bool = False

  @nn.compact
  def __call__(self, targets, encoded=None, decoder_mask=None, decode=False,
               deterministic=True, return_reps=False):
    if self.style == "masked" and decode:
      raise ValueError("Masked models have no decode cache")

    positioner = common.AddPositionEmbs(decode=decode,
                                        name="PosEmbedTargets")
    y = positioner(targets, vit.get_posemb(self, "learn", (1, self.seq_len),
                                           self.emb_dim, "pos_emb"))

    block_kw = dict(num_heads=self.num_heads, mlp_dim=self.mlp_dim,
                    dropout_rate=self.dropout_rate, decode=decode)
    out = {}
    if self.scan:
      from flax.linen import partitioning  # pylint: disable=g-import-not-at-top
      block = nn.remat(
          EncoderDecoderBlock, prevent_cse=False, static_argnums=(-1,),
          policy=getattr(jax.checkpoint_policies, self.remat_policy, None))
      # ScanIn keeps the stacked-params axis out of the logical avals when
      # restoring; plain axis 1 only at init time.
      spec = 1 if self.is_mutable_collection("params") else (
          partitioning.ScanIn(1))
      scan_kw = dict(variable_axes={"params": spec, "cache": 0},
                     split_rngs=dict.fromkeys(["params", "dropout"], True),
                     in_axes=nn.broadcast)
      stack = nn.scan(block, length=self.num_layers, **scan_kw)(
          name="EncDecBlock", **block_kw)
      y, reps = stack(y, encoded, decoder_mask, deterministic)
      per_block = list(reps)
    else:
      per_block = []
      for l in range(self.num_layers):
        y, _ = EncoderDecoderBlock(name=f"EncDecBlock{l}", **block_kw)(
            y, encoded, decoder_mask=decoder_mask,
            deterministic=deterministic)
        per_block.append(y)

    # Sequence-pooled per-block activations, for representation probes.
    out.update({f"block{l}_rep": jnp.mean(rep, axis=1)
                for l, rep in enumerate(per_block)})
    y = nn.LayerNorm(name="LayerNorm")(y)
    head = nn.Dense(self.out_dim, name="LogitsDense",
                    kernel_init=nn.initializers.zeros)
    out["pre_logits"] = jnp.mean(y, axis=1)
    raw = out["logits"] = head(y)
    return (raw, out) if return_reps else raw


class Model(nn.Module):
  """GIVT (decoder-only when num_layers=0).

  Field names/defaults are the config-compat surface (kwargs-only); they
  are grouped here by role, not in the reference's declaration order.
  """
  # -- GMM output head over continuous tokens --
  out_dim: int = 32
  num_mixtures: int = 4
  per_channel_mixtures: bool = True
  multivariate: bool = False
  scale_tol: float = 1e-6
  fix_square_plus: bool = False
  # -- transformer geometry (shared by encoder & decoder) --
  emb_dim: int = 512
  mlp_dim: int = 2048
  num_heads: int = 8
  num_decoder_layers: int = 6
  num_layers: int = 0  # encoder depth; 0 = no encoder
  seq_len: int = 256
  posemb_type: Literal["learn", "sincos2d"] = "learn"
  scan: bool = False
  remat_policy: str = "nothing_saveable"
  # -- encoder patchification (encoder-decoder mode only) --
  input_size: Sequence[int] = (256, 256)
  patches: Sequence[int] = (16, 16)
  # -- conditioning / masked-mode training --
  style: Literal["ar", "masked"] = "ar"
  num_labels: Optional[int] = 1000
  mask_style: str = "replace"
  mask_schedule_train: str = "cosine"
  min_masking_rate_training: float = 0.3
  drop_labels_probability: float = 0.0
  # -- regularization & init --
  enc_dropout_rate: float = 0.0
  dec_dropout_rate: float = 0.0
  zero_decoder_seq: bool = False
  zero_embedding_init: bool = False

  @property
  def has_encoder(self):
    return self.num_layers > 0

  @property
  def num_logits(self):
    """Raw head width, by distribution family (see distributions.py)."""
    d, k = self.out_dim, self.num_mixtures
    if self.multivariate:  # mean + lower-triangular scale (k must be 1)
      assert k == 1
      return d * d + d
    if self.per_channel_mixtures:  # per-channel (logit, mean, scale) x k
      return 3 * k * d
    return k * (1 + 2 * d)  # shared mixture logits + per-component mean/scale

  def setup(self):
    assert self.posemb_type == "learn"
    assert self.num_mixtures > 0
    if self.multivariate and self.num_mixtures != 1:
      raise ValueError("Multivariate requires num_mixtures == 1")

    self.encoder = self._build_encoder() if self.has_encoder else None

    # Label vocabulary = real labels followed by the mode's special slots.
    self.special_labels = self._assign_special_labels()
    if self.zero_embedding_init:
      emb_init = nn.initializers.zeros
    else:
      emb_init = nn.initializers.normal(stddev=1.0)
    vocab = (self.num_labels or 1) + len(self.special_labels)
    self.labels_emb = nn.Embed(vocab, self.emb_dim,
                               embedding_init=emb_init, name="EmbedLabels")
    self.targets_emb = nn.Dense(self.emb_dim, name="EmbedTargets")

    shared = dict(emb_dim=self.emb_dim, mlp_dim=self.mlp_dim,
                  num_heads=self.num_heads, scan=self.scan,
                  remat_policy=self.remat_policy)
    # Masked mode prepends the label token to the full sequence.
    dec_seq_len = self.seq_len + int(self.style == "masked")
    self.decoder = Decoder(
        style=self.style, seq_len=dec_seq_len, out_dim=self.num_logits,
        num_layers=self.num_decoder_layers or self.num_layers,
        dropout_rate=self.dec_dropout_rate,
        zero_embedding_init=self.zero_embedding_init, **shared)

  def _build_encoder(self):
    tokens_hw = tuple(np.array(self.input_size) // np.array(self.patches))
    self.pos_emb_for_encoder = vit.get_posemb(
        self, self.posemb_type, tokens_hw, self.emb_dim,
        "pos_embedding_encoder")
    self.conv = nn.Conv(self.emb_dim, tuple(self.patches),
                        strides=tuple(self.patches), padding="VALID",
                        name="EmbedPatches")
    return vit.Encoder(depth=self.num_layers, mlp_dim=self.mlp_dim,
                       num_heads=self.num_heads, scan=self.scan,
                       dropout=self.enc_dropout_rate,
                       remat_policy=self.remat_policy)

  def _assign_special_labels(self):
    """Special label ids slot in directly after the real ones (ref :219)."""
    needed = []
    if self.style == "masked":
      try:
        needed += {"replace": [MASK],
                   "concat": [MASK, NOMASK, REPLACE]}[self.mask_style]
      except KeyError:
        raise NotImplementedError(self.mask_style) from None
    if self.drop_labels_probability > 0:
      needed.append(NOLABEL)
    ids = itertools.count(self.num_labels or 0)
    return dict(zip(needed, ids))

  def encode(self, image, train=False):
    patches = self.conv(image)
    tokens = patches.reshape(patches.shape[0], -1, patches.shape[-1])
    tokens += self.pos_emb_for_encoder
    encoded, _ = self.encoder(tokens, deterministic=not train)
    return encoded

  def embed_labels(self, labels=None, batch_size=None):
    if labels is None:
      assert batch_size is not None
      assert self.num_labels in (1, None)
      labels = jnp.zeros((batch_size,), jnp.int32)
    return self.labels_emb(labels)[:, None, :]

  def _special_emb(self, size, label):
    token_id = self.special_labels[label]
    return self.labels_emb(jnp.full(size, token_id, jnp.int32))

  def prefill(self, labels=None, batch_size=None, encoded=None,
              drop_labels=None):
    kept = self._drop_labels(drop_labels, labels)
    first = self.embed_labels(labels=kept, batch_size=batch_size)
    return self.decoder(first, encoded=encoded, decode=True)

  def _decode_ar(self, targets, labels=None, encoded=None, decode=False,
                 train=False):
    seq = self.targets_emb(targets)
    if not decode:
      # Teacher forcing: [label, t_0 .. t_{L-2}] predicts [t_0 .. t_{L-1}].
      lab = self.embed_labels(labels, targets.shape[0])
      seq = jnp.concatenate([lab, seq[:, :-1]], axis=1)
    # One-step-wise decoding relies on the flax cache for causality; the
    # teacher-forced path needs the explicit triangular mask.
    causal = None if decode else nn.make_causal_mask(targets[:, :, 0])
    return self.decoder(seq, encoded=encoded, decoder_mask=causal,
                        decode=decode, deterministic=not train,
                        return_reps=True)

  def _decode_masked(self, targets, input_mask, labels=None, encoded=None,
                     train=False):
    b, s = input_mask.shape
    assert targets.shape[:2] == (b, s), (targets.shape, input_mask.shape)
    masked = input_mask[:, :, None]
    if self.mask_style == "replace":
      embedded = jnp.where(masked, self._special_emb((b, s),
                                                     MASK),
                           self.targets_emb(targets))
    elif self.mask_style == "concat":
      # Half the channels carry the mask/nomask flag embedding, half the
      # (REPLACE-d where masked) content embedding.
      flag = jnp.where(masked, self._special_emb((b, s), MASK),
                       self._special_emb((b, s), NOMASK))
      content = jnp.where(masked,
                          self._special_emb((b, s), REPLACE),
                          self.targets_emb(targets))
      halves = (flag[..., ::2], content[..., ::2])
      embedded = jnp.concatenate(halves, axis=-1)
    else:
      raise ValueError(f"unsupported mask_style: {self.mask_style!r}")

    embedded = jnp.concatenate([self.embed_labels(labels, b), embedded],
                               axis=1)
    logits = self.decoder(embedded, encoded=encoded, decoder_mask=None,
                          decode=False, deterministic=not train)
    return logits[:, 1:, ...]  # Drop the label position.

  def _drop_labels(self, drop_labels_mask, labels):
    if labels is None:
      return None
    nolabel = lambda: jnp.full_like(
        labels, self.special_labels[NOLABEL])
    if self.drop_labels_probability >= 0.999:
      return nolabel()
    if drop_labels_mask is None:
      return labels
    return jnp.where(drop_labels_mask, nolabel(), labels)

  def decode(self, targets, labels=None, encoded=None, decode=False,
             train=False, max_decode_length=None, input_mask=None,
             drop_labels=None, return_reps=False):
    del max_decode_length
    labels = self._drop_labels(drop_labels, labels)
    if self.style == "masked":
      assert not decode and input_mask is not None and not return_reps
      return self._decode_masked(targets, input_mask, labels, encoded, train)
    assert self.style == "ar", self.style
    logits, reps = self._decode_ar(targets, labels, encoded, decode, train)
    return (logits, reps) if return_reps else logits

  def _square_plus(self, x):
    if self.fix_square_plus:
      return distributions.square_plus(x)
    return distributions.square_plus_legacy(x)

  def get_pdf(self, logits, temperature_scales=None, temperature_probs=None):
    kw = dict(scale_tol=self.scale_tol, sp=self._square_plus,
              temp_scales=temperature_scales)
    assert logits.shape[-1] == self.num_logits
    if self.multivariate:
      return distributions.mvn_tri_from_raw(logits, out_dim=self.out_dim,
                                            **kw)
    if self.per_channel_mixtures:
      return distributions.per_channel_from_raw(
          logits, num_mixtures=self.num_mixtures,
          temp_probs=temperature_probs, **kw)
    return distributions.mixture_from_raw(
        logits, num_mixtures=self.num_mixtures, out_dim=self.out_dim,
        temp_probs=temperature_probs, **kw)

  def __call__(self, sequence, labels=None, *, image=None, decode=False,
               input_mask=None, drop_labels=None, train=False):
    if self.style == "masked" and input_mask is None:
      raise ValueError("Masked model requires input_mask")
    assert (image is not None) == (self.encoder is not None), (
        "pass image iff the model has an encoder")
    encoded = self.encode(image, train=train) if self.encoder else None
    raw = self.decode(sequence, encoded=encoded, labels=labels,
                      input_mask=input_mask, decode=decode, train=train)
    return raw, self.get_pdf(raw)

  def get_input_mask_training(self, rng, shape):
    if self.style == "ar":
      return None
    batch, length = shape
    # Progress is drawn per-example, capped so at least
    # min_masking_rate_training of the sequence stays masked.
    progress = jax.random.uniform(
        rng, (batch,), maxval=1.0 - self.min_masking_rate_training)
    return _random_mask_with_ratios(
        rng, ratios=apply_mask_schedule(progress, self.mask_schedule_train),
        seq_len=length)

  def get_input_mask_teacher_forced(self, shape):
    if self.style == "ar":
      return None
    return jnp.zeros(shape, bool)

  def get_drop_labels(self, rng, batch_size):
    p = self.drop_labels_probability
    if not p:
      return None
    return jax.random.uniform(rng, (batch_size,)) <= p


def load(init_params, init_files, model_params=None, dont_load=(),
         resample_encoder_posemb=False, trim_decoder_posemb=False):
  """Checkpoint load with optional posemb resample/trim (ref :780)."""
  del model_params
  assert isinstance(init_files, str), "Composite init not supported yet"
  ckpt = common.merge_params(u.load_params(init_files), init_params,
                             dont_load)
  have = init_params or {}
  enc, dec = "pos_embedding_encoder", "pos_embedding_decoder"
  if resample_encoder_posemb and enc in have:
    # Encoder grid changed (different input size): 2d-resample.
    ckpt[enc] = vit.resample_posemb(old=ckpt[enc], new=have[enc])
  if trim_decoder_posemb and dec in have:
    # Decoder sequence shrank (shorter latent code): truncate.
    ckpt[dec] = ckpt[dec][:, :have[dec].shape[1], :]
  return ckpt
