"""CNN encoder/decoder backbone for the GIVT VAE.

Parity target: reference models/proj/givt/cnn.py (VQGAN-style conv stacks
with GroupNorm + swish; stride-2 down/upsampling). Compact re-design with
the same interface: Encoder -> [B, H/2^n, W/2^n, 2*codeword_dim] stats,
Decoder -> image.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import einops
import flax.linen as nn
import jax
import jax.numpy as jnp

from big_vision_tpu.models import common
from big_vision_tpu.models.proj.givt import vae as _vae
import big_vision_tpu.utils as u


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

_ACTS = {"relu": nn.relu, "swish": nn.swish}


def _norm_layer(norm_type, dtype):
  makers = {
      "GN": lambda: nn.GroupNorm(dtype=dtype, use_fast_variance=False),
      "LN": lambda: nn.LayerNorm(dtype=dtype, use_fast_variance=False),
  }
  if norm_type not in makers:
    raise NotImplementedError(
        f"norm_type={norm_type!r}: no released GIVT config uses BN; add a "
        "batch_stats collection before enabling it.")
  return makers[norm_type]


def _avg_pool_tf(x):
  """2x2/2 average pool that EXCLUDES padding cells from the mean (TF
  semantics; flax's avg_pool includes them — ref cnn.py:66-89)."""
  dims = (1, 2, 2, 1)
  pooled, cells = (jax.lax.reduce_window(t, 0.0, jax.lax.add, dims, dims,
                                         "SAME")
                   for t in (x, jnp.ones_like(x)))
  return pooled / cells


def get_h_w_pixelshuffle(hw, patch):
  ph, pw = patch
  s = int(math.isqrt(hw * ph * pw))
  h, w = s // ph, s // pw
  assert h * w == hw, f"code_len {hw} incompatible with shuffle {patch}"
  return h, w


def _shuffle_tokens(z, ph, pw):
  """Space-to-depth: fold a (ph, pw) latent tile into one token."""
  return einops.rearrange(z, "b (h ph) (w pw) c -> b (h w) (c ph pw)",
                          ph=ph, pw=pw)


def _unshuffle_tokens(z, grid_hw, ph, pw):
  """Depth-to-space inverse of _shuffle_tokens."""
  return einops.rearrange(z, "b (h w) (c ph pw) -> b (h ph) (w pw) c",
                          h=grid_hw[0], w=grid_hw[1], ph=ph, pw=pw)


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
    residual, input_dim = x, x.shape[-1]
    for _ in range(2):  # two norm-act-conv stages
      x = nn.Conv(self.filters, (3, 3), use_bias=False)(
          self.activation_fn(self.norm_fn()(x)))
    if input_dim != self.filters:
      residual = nn.Conv(self.filters, (1, 1), use_bias=False)(x)
    return x + residual


class _RefStack(nn.Module):
  """Shared plumbing of the MaskGIT encoder/decoder stacks."""
  filters: int
  num_res_blocks: int
  channel_multipliers: Sequence[int]
  norm_type: str = "GN"
  activation_fn_str: str = "swish"
  dtype: Any = jnp.float32

  def _tools(self):
    """(norm ctor, activation, auto-named residual-block ctor)."""
    norm_fn = _norm_layer(self.norm_type, self.dtype)
    act = _ACTS[self.activation_fn_str]
    counter = iter(range(10_000))
    def res_block(width):
      return RefResBlock(width, norm_fn=norm_fn, activation_fn=act,
                         name=f"ResBlock_{next(counter)}")
    return norm_fn, act, res_block


class RefEncoder(_RefStack):
  """Image -> [B, h, w, embedding_dim] (ref cnn.py:142-190)."""
  embedding_dim: int = 32
  conv_downsample: bool = False

  @nn.compact
  def __call__(self, x, train=False):
    del train  # GN/LN only; no batch statistics.
    norm_fn, act, res_block = self._tools()
    x = nn.Conv(self.filters, (3, 3), use_bias=False)(x)
    n_stages = len(self.channel_multipliers)
    for i, mult in enumerate(self.channel_multipliers):
      width = self.filters * mult
      for _ in range(self.num_res_blocks):
        x = res_block(width)(x)
      if i + 1 < n_stages:
        x = (nn.Conv(width, (4, 4), strides=(2, 2))(x)
             if self.conv_downsample else _avg_pool_tf(x))
    for _ in range(self.num_res_blocks):  # trailing full-width blocks
      x = res_block(width)(x)
    return nn.Conv(self.embedding_dim, (1, 1))(act(norm_fn()(x)))


class RefDecoder(_RefStack):
  """[B, h, w, d] -> image (ref cnn.py:194-240): nearest-neighbor
  upsample + conv (not transposed conv)."""
  output_dim: int = 3

  @nn.compact
  def __call__(self, x, train=False):
    del train
    norm_fn, act, res_block = self._tools()
    width = self.filters * self.channel_multipliers[-1]
    x = nn.Conv(width, (3, 3), use_bias=True)(x)
    for _ in range(self.num_res_blocks):  # leading full-width blocks
      x = res_block(width)(x)
    for i in reversed(range(len(self.channel_multipliers))):
      width = self.filters * self.channel_multipliers[i]
      for _ in range(self.num_res_blocks):
        x = res_block(width)(x)
      if i:
        b, h, w, c = x.shape
        up = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
        x = nn.Conv(width, (3, 3))(up)
    return nn.Conv(self.output_dim, (3, 3))(act(norm_fn()(x)))


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
    stack_kw = dict(filters=self.filters,
                    num_res_blocks=self.num_res_blocks,
                    channel_multipliers=self.channel_multipliers,
                    norm_type=self.norm_type,
                    activation_fn_str=self.activation_fn,
                    dtype=self.dtype)
    self.encoder = RefEncoder(name="cnn_encoder",
                              embedding_dim=2 * self.codeword_dim,
                              conv_downsample=self.conv_downsample,
                              **stack_kw)
    self.decoder = RefDecoder(name="cnn_decoder",
                              output_dim=self.output_dim, **stack_kw)

  def encode(self, x, *, train=False):
    if self.malib_ckpt:
      x = (x + 1.0) / 2.0
    stats = self.encoder(x, train=train)
    assert stats.shape[1] == stats.shape[2], (
        f"Square latents required: {stats.shape}")
    mu, logvar = jnp.split(stats, 2, axis=-1)
    if self.malib_ckpt:
      logvar = jnp.clip(logvar, -30.0, 20.0)
    ph, pw = self.pixel_shuffle_patch_size
    return _shuffle_tokens(mu, ph, pw), _shuffle_tokens(logvar, ph, pw)

  def decode(self, x, train=False):
    ph, pw = self.pixel_shuffle_patch_size
    grid = get_h_w_pixelshuffle(x.shape[1], (ph, pw))
    img = self.decoder(_unshuffle_tokens(x, grid, ph, pw), train=train)
    if self.malib_ckpt:
      img = 2.0 * img - 1.0
    return jnp.clip(img, -1.0, 1.0)


def load(init_params, init_file, model_params=None, dont_load=(),
         malib_ckpt=False, use_ema_params=False):
  """Loads a VAE checkpoint; malib (VAE-GAN trainer) checkpoints keep the
  generator under g_params/ (or ema_params/), remapped onto cnn_*
  (ref cnn.py:333-376)."""
  del model_params
  assert malib_ckpt or not use_ema_params, (
      "EMA params only exist in malib checkpoints.")
  if not malib_ckpt:
    params = u.load_params(init_file)
  else:
    import flax
    import flax.training.checkpoints
    with jax.transfer_guard("allow"):
      raw = flax.training.checkpoints.restore_checkpoint(init_file, None)
    prefix = "ema_params/" if use_ema_params else "g_params/"
    params = u.tree_unflatten(
        [(k.replace(prefix, "cnn_"), v)
         for k, v in u.tree_flatten_with_names(raw)[0] if prefix in k])
  if init_params is None:
    return params
  return common.merge_params(params, init_params, dont_load)
