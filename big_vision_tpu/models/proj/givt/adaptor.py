"""Invertible iRevNet adaptor over GIVT latent sequences.

Parity target: reference models/proj/givt/adaptor.py (which follows the
public PyTorch iRevNet, github.com/jhjacobsen/pytorch-i-revnet). Additive
couplings over the channel split make forward/inverse exact with zero
log-det, so the adaptor reshapes latent likelihoods without changing them.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import einops
import flax.linen as nn
import jax

import big_vision_tpu.utils as u
from big_vision_tpu.models import common


def get_h_w_pixelshuffle(hw, pixel_shuffle_patch_size):
  """Spatial dims after space-to-depth, assuming a square source image."""
  ph, pw = pixel_shuffle_patch_size
  s = int(math.sqrt(hw * ph * pw))
  h, w = s // ph, s // pw
  assert h * w == hw, f"Length {hw} incompatible with shuffle ({ph},{pw})"
  return h, w


def _split(x):
  n = x.shape[-1] // 2
  return x[..., :n], x[..., n:]


def _merge(x1, x2):
  return jax.numpy.concatenate((x1, x2), axis=-1)


class IRevNetBlock(nn.Module):
  """Additive coupling y1 = x1 + f(x2): exactly invertible."""
  first: bool = False
  dropout_rate: float = 0.0
  num_channels: int = 2
  num_channels_bottleneck: Optional[int] = None
  num_grps_norm: int = 32

  @nn.compact
  def _fx2(self, x, train=True):
    ks = (3, 3)
    if not self.first:
      y = nn.relu(nn.GroupNorm(num_groups=self.num_grps_norm,
                               name="gn_0")(x))
    else:
      y = x
    mid = self.num_channels_bottleneck or self.num_channels
    y = nn.Conv(mid, kernel_size=ks, padding=1, use_bias=False)(y)
    y = nn.relu(nn.GroupNorm(num_groups=self.num_grps_norm,
                             name="gn_1")(y))
    y = nn.Conv(mid, kernel_size=ks, padding=1, use_bias=False)(y)
    y = nn.Dropout(rate=self.dropout_rate,
                   deterministic=not train)(y)
    y = nn.relu(nn.GroupNorm(num_groups=self.num_grps_norm,
                             name="gn_2")(y))
    return nn.Conv(self.num_channels, kernel_size=ks, padding=1,
                   use_bias=False)(y)

  def forward(self, x, train=True):
    x1, x2 = x
    return (x2, self._fx2(x2, train=train) + x1)

  def inverse(self, x, train=True):
    x2, y1 = x
    return (y1 - self._fx2(x2, train=train), x2)


class IRevNet(nn.Module):
  """Stack of iRevNet blocks over a channel-split [B, H, W, C] tensor."""
  num_blocks: int = 4
  num_channels: int = 4
  num_channels_bottleneck: Optional[int] = None
  dropout_rate: float = 0.0

  def setup(self):
    num_grps = min(32, self.num_channels // 2)
    # Named `modules` so param trees match the published checkpoints
    # (modules_0, modules_1, ... — ref adaptor.py:107).
    self.modules = [
        IRevNetBlock(
            first=(i == 0),
            num_channels=self.num_channels // 2,
            num_channels_bottleneck=(
                self.num_channels_bottleneck or self.num_channels) // 2,
            num_grps_norm=num_grps,
            dropout_rate=self.dropout_rate)
        for i in range(self.num_blocks)]

  def forward(self, x, train=True):
    out = _split(x)
    for m in self.modules:
      out = m.forward(out, train=train)
    return _merge(*out)

  def inverse(self, out_bij, train=True):
    out = _split(out_bij)
    for m in reversed(self.modules):
      out = m.inverse(out, train=train)
    return _merge(*out)

  def __call__(self, x, train=True):
    return self.forward(x, train=train)


class Model(IRevNet):
  """[B, code_len, D] sequence adaptor via pixel-shuffle spatialization."""

  pixel_shuffle_patch_size: tuple = (1, 1)

  def forward(self, x, train=True):
    h, w = get_h_w_pixelshuffle(x.shape[1], self.pixel_shuffle_patch_size)
    x = einops.rearrange(x, "b (h w) c -> b h w c", h=h, w=w)
    x = super().forward(x, train)
    return einops.rearrange(x, "b h w c -> b (h w) c")

  def inverse(self, out_bij, train=True):
    h, w = get_h_w_pixelshuffle(out_bij.shape[1],
                                self.pixel_shuffle_patch_size)
    out_bij = einops.rearrange(out_bij, "b (h w) c -> b h w c", h=h, w=w)
    out_bij = super().inverse(out_bij, train)
    return einops.rearrange(out_bij, "b h w c -> b (h w) c")


def load(init_params: Any, init_file: str, model_params: Any = None,
         dont_load: Sequence[str] = ()) -> Any:
  del model_params
  params = u.load_params(init_file)
  if init_params is not None:
    params = common.merge_params(params, init_params, dont_load)
  return params
