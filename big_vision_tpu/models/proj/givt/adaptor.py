"""Invertible iRevNet adaptor over GIVT latent sequences.

Parity target: reference models/proj/givt/adaptor.py (which follows the
public PyTorch iRevNet, github.com/jhjacobsen/pytorch-i-revnet). Additive
couplings over the channel split make forward/inverse exact with zero
log-det, so the adaptor reshapes latent likelihoods without changing them.
Param tree names (modules_i, gn_j) match published checkpoints.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

import big_vision_tpu.utils as u
from big_vision_tpu.models import common


def get_h_w_pixelshuffle(hw, pixel_shuffle_patch_size):
  """Spatial dims after space-to-depth, assuming a square source image."""
  ph, pw = pixel_shuffle_patch_size
  side = math.isqrt(hw * ph * pw)
  if (side // ph) * (side // pw) != hw:
    raise ValueError(f"Length {hw} incompatible with shuffle ({ph},{pw})")
  return side // ph, side // pw


class IRevNetBlock(nn.Module):
  """Additive coupling y1 = x1 + f(x2): exactly invertible."""
  first: bool = False
  dropout_rate: float = 0.0
  num_channels: int = 2
  num_channels_bottleneck: Optional[int] = None
  num_grps_norm: int = 32

  @nn.compact
  def _fx2(self, x, train=True):
    gn = functools.partial(nn.GroupNorm, num_groups=self.num_grps_norm)
    conv3x3 = functools.partial(nn.Conv, kernel_size=(3, 3), padding=1,
                                use_bias=False)
    mid = self.num_channels_bottleneck or self.num_channels
    y = x if self.first else nn.relu(gn(name="gn_0")(x))
    y = nn.relu(gn(name="gn_1")(conv3x3(mid)(y)))
    y = conv3x3(mid)(y)
    y = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(y)
    y = nn.relu(gn(name="gn_2")(y))
    return conv3x3(self.num_channels)(y)

  def forward(self, halves, train=True):
    passive, active = halves
    return active, passive + self._fx2(active, train=train)

  def inverse(self, halves, train=True):
    active, coupled = halves
    return coupled - self._fx2(active, train=train), active


class IRevNet(nn.Module):
  """Stack of iRevNet blocks over a channel-split [B, H, W, C] tensor."""
  num_blocks: int = 4
  num_channels: int = 4
  num_channels_bottleneck: Optional[int] = None
  dropout_rate: float = 0.0

  def setup(self):
    half = self.num_channels // 2
    # Named `modules` so param trees match the published checkpoints
    # (modules_0, modules_1, ... — ref adaptor.py:107).
    self.modules = [
        IRevNetBlock(
            first=(i == 0),
            num_channels=half,
            num_channels_bottleneck=(
                self.num_channels_bottleneck or self.num_channels) // 2,
            num_grps_norm=min(32, half),
            dropout_rate=self.dropout_rate)
        for i in range(self.num_blocks)]

  @staticmethod
  def _halve(x):
    return x[..., :x.shape[-1] // 2], x[..., x.shape[-1] // 2:]

  def forward(self, x, train=True):
    halves = self._halve(x)
    for block in self.modules:
      halves = block.forward(halves, train=train)
    return jnp.concatenate(halves, axis=-1)

  def inverse(self, out_bij, train=True):
    halves = self._halve(out_bij)
    for block in self.modules[::-1]:
      halves = block.inverse(halves, train=train)
    return jnp.concatenate(halves, axis=-1)

  def __call__(self, x, train=True):
    return self.forward(x, train=train)


class Model(IRevNet):
  """[B, code_len, D] sequence adaptor via pixel-shuffle spatialization."""

  pixel_shuffle_patch_size: tuple = (1, 1)

  def _as_grid(self, seq):
    h, w = get_h_w_pixelshuffle(seq.shape[1], self.pixel_shuffle_patch_size)
    return seq.reshape(seq.shape[0], h, w, seq.shape[-1])

  def forward(self, seq, train=True):
    y = super().forward(self._as_grid(seq), train)
    return y.reshape(seq.shape)

  def inverse(self, out_bij, train=True):
    y = super().inverse(self._as_grid(out_bij), train)
    return y.reshape(out_bij.shape)


def load(init_params: Any, init_file: str, model_params: Any = None,
         dont_load: Sequence[str] = ()) -> Any:
  del model_params
  params = u.load_params(init_file)
  if init_params is not None:
    params = common.merge_params(params, init_params, dont_load)
  return params
