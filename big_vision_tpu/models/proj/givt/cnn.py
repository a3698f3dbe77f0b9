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
