"""CNN encoder/decoder backbone for the GIVT VAE.

Parity target: reference models/proj/givt/cnn.py (VQGAN-style conv stacks
with GroupNorm + swish; stride-2 down/upsampling). Compact re-design with
the same interface: Encoder -> [B, H/2^n, W/2^n, 2*codeword_dim] stats,
Decoder -> image.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn


class ResBlock(nn.Module):
  filters: int

  @nn.compact
  def __call__(self, x):
    h = nn.GroupNorm(num_groups=min(32, x.shape[-1]))(x)
    h = nn.swish(h)
    h = nn.Conv(self.filters, (3, 3))(h)
    h = nn.GroupNorm(num_groups=min(32, self.filters))(h)
    h = nn.swish(h)
    h = nn.Conv(self.filters, (3, 3))(h)
    if x.shape[-1] != self.filters:
      x = nn.Conv(self.filters, (1, 1))(x)
    return x + h


class Encoder(nn.Module):
  """Image -> latent distribution stats [B, h, w, out_dim]."""
  filters: int = 64
  num_res_blocks: int = 2
  channel_multipliers: Sequence[int] = (1, 2, 4)
  out_dim: int = 32  # 2 * codeword_dim (mu, logvar)

  @nn.compact
  def __call__(self, x):
    x = nn.Conv(self.filters, (3, 3))(x)
    for i, mult in enumerate(self.channel_multipliers):
      for _ in range(self.num_res_blocks):
        x = ResBlock(self.filters * mult)(x)
      if i < len(self.channel_multipliers) - 1:
        x = nn.Conv(self.filters * mult, (4, 4), strides=(2, 2))(x)
    x = nn.GroupNorm(num_groups=min(32, x.shape[-1]))(x)
    x = nn.swish(x)
    return nn.Conv(self.out_dim, (1, 1))(x)


class Decoder(nn.Module):
  """Latents [B, h, w, d] -> image [B, H, W, out_channels]."""
  filters: int = 64
  num_res_blocks: int = 2
  channel_multipliers: Sequence[int] = (1, 2, 4)
  out_channels: int = 3

  @nn.compact
  def __call__(self, x):
    mults = list(reversed(self.channel_multipliers))
    x = nn.Conv(self.filters * mults[0], (3, 3))(x)
    for i, mult in enumerate(mults):
      for _ in range(self.num_res_blocks):
        x = ResBlock(self.filters * mult)(x)
      if i < len(mults) - 1:
        x = nn.ConvTranspose(self.filters * mults[i + 1], (4, 4),
                             strides=(2, 2))(x)
    x = nn.GroupNorm(num_groups=min(32, x.shape[-1]))(x)
    x = nn.swish(x)
    return nn.Conv(self.out_channels, (3, 3))(x)


# ---------------------------------------------------------------------------
# Reference-checkpoint-compatible MaskGIT/VQGAN tokenizer (the published
# GIVT ImageNet VAEs: ref models/proj/givt/cnn.py:115-376, itself adapted
# from maskgit's vqgan_tokenizer.py). Module creation ORDER and bias flags
# below are the param-tree contract with those checkpoints — do not
# reorder. The simple Encoder/Decoder above remain the default backbone
# of `proj.givt.vae`.
# ---------------------------------------------------------------------------

import math
from typing import Any, Optional

import einops
import jax
import jax.numpy as jnp
import numpy as np

from big_vision_tpu.models import common
from big_vision_tpu.models.proj.givt import vae as _vae
import big_vision_tpu.utils as u


def _norm_layer(norm_type, dtype):
  if norm_type == "GN":
    return lambda: nn.GroupNorm(dtype=dtype, use_fast_variance=False)
  if norm_type == "LN":
    return lambda: nn.LayerNorm(dtype=dtype, use_fast_variance=False)
  raise NotImplementedError(
      f"norm_type={norm_type!r}: no released GIVT config uses BN; add a "
      "batch_stats collection before enabling it.")


def _act(name):
  return {"relu": nn.relu, "swish": nn.swish}[name]


def _avg_pool_tf(x):
  """2x2/2 average pool that EXCLUDES padding cells from the mean (TF
  semantics; flax's avg_pool includes them — ref cnn.py:66-89)."""
  window, strides = (1, 2, 2, 1), (1, 2, 2, 1)
  s = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, "SAME")
  n = jax.lax.reduce_window(jnp.ones_like(x), 0.0, jax.lax.add, window,
                            strides, "SAME")
  return s / n


def get_h_w_pixelshuffle(hw, patch):
  ph, pw = patch
  s = int(math.isqrt(hw * ph * pw))
  h, w = s // ph, s // pw
  assert h * w == hw, f"code_len {hw} incompatible with shuffle {patch}"
  return h, w


class RefResBlock(nn.Module):
  """MaskGIT residual block. When channels change, the shortcut conv is
  applied to the TRANSFORMED features (out = x' + conv(x'), NOT the usual
  out = x' + conv(input)), faithfully reproducing the published
  checkpoints' computation (ref cnn.py:131-139, inherited from maskgit).
  Instantiated with explicit name="ResBlock_N" so param trees match the
  published checkpoints (the module above named `ResBlock` is the
  unrelated default backbone's block)."""
  filters: int
  norm_fn: Any
  activation_fn: Any

  @nn.compact
  def __call__(self, x):
    input_dim = x.shape[-1]
    residual = x
    x = self.norm_fn()(x)
    x = self.activation_fn(x)
    x = nn.Conv(self.filters, (3, 3), use_bias=False)(x)
    x = self.norm_fn()(x)
    x = self.activation_fn(x)
    x = nn.Conv(self.filters, (3, 3), use_bias=False)(x)
    if input_dim != self.filters:
      residual = nn.Conv(self.filters, (1, 1), use_bias=False)(x)
    return x + residual


class RefEncoder(nn.Module):
  """Image -> [B, h, w, embedding_dim] (ref cnn.py:142-190)."""
  filters: int
  num_res_blocks: int
  channel_multipliers: Sequence[int]
  embedding_dim: int
  conv_downsample: bool = False
  norm_type: str = "GN"
  activation_fn_str: str = "swish"
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x, train=False):
    del train  # GN/LN only; no batch statistics.
    norm_fn = _norm_layer(self.norm_type, self.dtype)
    act = _act(self.activation_fn_str)
    kw = dict(norm_fn=norm_fn, activation_fn=act)
    x = nn.Conv(self.filters, (3, 3), use_bias=False)(x)
    nblk = 0
    for i, mult in enumerate(self.channel_multipliers):
      filters = self.filters * mult
      for _ in range(self.num_res_blocks):
        x = RefResBlock(filters, name=f"ResBlock_{nblk}", **kw)(x)
        nblk += 1
      if i < len(self.channel_multipliers) - 1:
        if self.conv_downsample:
          x = nn.Conv(filters, (4, 4), strides=(2, 2))(x)
        else:
          x = _avg_pool_tf(x)
    for _ in range(self.num_res_blocks):
      x = RefResBlock(filters, name=f"ResBlock_{nblk}", **kw)(x)
      nblk += 1
    x = norm_fn()(x)
    x = act(x)
    return nn.Conv(self.embedding_dim, (1, 1))(x)


class RefDecoder(nn.Module):
  """[B, h, w, d] -> image (ref cnn.py:194-240): nearest-neighbor
  upsample + conv (not transposed conv)."""
  filters: int
  num_res_blocks: int
  channel_multipliers: Sequence[int]
  norm_type: str = "GN"
  activation_fn_str: str = "swish"
  output_dim: int = 3
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x, train=False):
    del train
    norm_fn = _norm_layer(self.norm_type, self.dtype)
    act = _act(self.activation_fn_str)
    kw = dict(norm_fn=norm_fn, activation_fn=act)
    filters = self.filters * self.channel_multipliers[-1]
    x = nn.Conv(filters, (3, 3), use_bias=True)(x)
    nblk = 0
    for _ in range(self.num_res_blocks):
      x = RefResBlock(filters, name=f"ResBlock_{nblk}", **kw)(x)
      nblk += 1
    for i in reversed(range(len(self.channel_multipliers))):
      filters = self.filters * self.channel_multipliers[i]
      for _ in range(self.num_res_blocks):
        x = RefResBlock(filters, name=f"ResBlock_{nblk}", **kw)(x)
        nblk += 1
      if i > 0:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
        x = nn.Conv(filters, (3, 3))(x)
    x = norm_fn()(x)
    x = act(x)
    return nn.Conv(self.output_dim, (3, 3))(x)


class Model(_vae.Model):
  """Gaussian VAE over the MaskGIT tokenizer (ref cnn.py:243-330).

  `malib_ckpt` checkpoints model images in [0, 1]: inputs are rescaled
  from [-1, 1], logvar clipped to [-30, 20], outputs mapped back.
  `pixel_shuffle_patch_size` folds (ph, pw) latent pixels into one token
  (space-to-depth), halving/quartering code_len.
  """
  filters: int = 128
  num_res_blocks: int = 2
  channel_multipliers: Sequence[int] = (1, 2, 4)
  conv_downsample: bool = False
  activation_fn: str = "swish"
  norm_type: str = "GN"
  output_dim: int = 3
  dtype: Any = jnp.float32
  malib_ckpt: bool = False
  pixel_shuffle_patch_size: tuple = (1, 1)

  def setup(self):
    self.encoder = RefEncoder(
        filters=self.filters,
        num_res_blocks=self.num_res_blocks,
        channel_multipliers=self.channel_multipliers,
        norm_type=self.norm_type,
        activation_fn_str=self.activation_fn,
        embedding_dim=2 * self.codeword_dim,
        conv_downsample=self.conv_downsample,
        dtype=self.dtype,
        name="cnn_encoder")
    self.decoder = RefDecoder(
        filters=self.filters,
        num_res_blocks=self.num_res_blocks,
        channel_multipliers=self.channel_multipliers,
        norm_type=self.norm_type,
        activation_fn_str=self.activation_fn,
        output_dim=self.output_dim,
        dtype=self.dtype,
        name="cnn_decoder")

  def encode(self, x, *, train=False):
    if self.malib_ckpt:
      x = (x + 1.0) / 2.0
    x = self.encoder(x, train=train)
    assert x.shape[1] == x.shape[2], f"Square latents required: {x.shape}"
    mu, logvar = jnp.split(x, 2, axis=-1)
    if self.malib_ckpt:
      logvar = jnp.clip(logvar, -30.0, 20.0)
    ph, pw = self.pixel_shuffle_patch_size
    to_tokens = lambda z: einops.rearrange(
        z, "b (h ph) (w pw) c -> b (h w) (c ph pw)", ph=ph, pw=pw)
    return to_tokens(mu), to_tokens(logvar)

  def decode(self, x, train=False):
    ph, pw = self.pixel_shuffle_patch_size
    h, w = get_h_w_pixelshuffle(x.shape[1], (ph, pw))
    x = einops.rearrange(x, "b (h w) (c ph pw) -> b (h ph) (w pw) c",
                         h=h, w=w, ph=ph, pw=pw)
    x = self.decoder(x, train=train)
    if self.malib_ckpt:
      x = 2.0 * x - 1.0
    return jnp.clip(x, -1.0, 1.0)


def load(init_params, init_file, model_params=None, dont_load=(),
         malib_ckpt=False, use_ema_params=False):
  """Loads a VAE checkpoint; malib (VAE-GAN trainer) checkpoints keep the
  generator under g_params/ (or ema_params/), remapped onto cnn_*
  (ref cnn.py:333-376)."""
  del model_params
  assert malib_ckpt or not use_ema_params, (
      "EMA params only exist in malib checkpoints.")
  if malib_ckpt:
    import flax
    import flax.training.checkpoints
    with jax.transfer_guard("allow"):
      raw = flax.training.checkpoints.restore_checkpoint(init_file, None)
    prefix = "ema_params/" if use_ema_params else "g_params/"
    flat = [(k.replace(prefix, "cnn_"), v)
            for k, v in u.tree_flatten_with_names(raw)[0] if prefix in k]
    params = u.tree_unflatten(flat)
  else:
    params = u.load_params(init_file)
  if init_params is not None:
    params = common.merge_params(params, init_params, dont_load)
  return params
