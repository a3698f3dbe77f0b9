"""Shared TPU-first convnet primitives (weight-standardized convs, GN).

Used by the BiT family (models/bit.py, models/bit_paper.py) and anything
else wanting GN+WS stacks. Design notes:

* Convolutions are emitted directly as `lax.conv_general_dilated` in NHWC /
  HWIO layout — the layout XLA:TPU lowers straight onto the MXU without
  transposes.
* Weight standardization is applied to the kernel *value* at read time, so
  it is a tiny fused prologue of the conv rather than a separate pass, and
  the stored parameter remains the raw kernel (checkpoint compatible).
* GroupNorm comes in two numeric flavors because the two public BiT
  releases differ: the flax-style centered-variance one (models/bit.py)
  and the mean-of-squares one used by the BiT-paper TF release
  (models/bit_paper.py) whose epsilon sits inside the sqrt.
"""

from __future__ import annotations

from typing import Any, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Padding = Union[str, Sequence[tuple]]


def _pair(v):
  return (v, v) if isinstance(v, int) else tuple(v)


class WSConv(nn.Module):
  """2D conv with weight standardization fused at kernel-read time.

  `ws` selects the standardization flavor:
    "std": (w - mean) / (std + eps)          [models/bit.py semantics]
    "rms": (w - mean) / sqrt(msq + eps)      [models/bit_paper.py semantics]
    None:  plain conv.
  """
  features: int
  ksize: Union[int, Sequence[int]] = 3
  strides: Union[int, Sequence[int]] = 1
  padding: Padding = "SAME"
  ws: Any = "std"
  eps: float = 1e-5
  use_bias: bool = False

  @nn.compact
  def __call__(self, x):
    kh, kw = _pair(self.ksize)
    kernel = self.param("kernel", nn.initializers.lecun_normal(),
                        (kh, kw, x.shape[-1], self.features))
    if self.ws:
      mu = jnp.mean(kernel, axis=(0, 1, 2), keepdims=True)
      centered = kernel - mu
      if self.ws == "std":
        denom = jnp.std(kernel, axis=(0, 1, 2), keepdims=True) + self.eps
      else:
        denom = jnp.sqrt(
            jnp.mean(jnp.square(centered), axis=(0, 1, 2), keepdims=True)
            + self.eps)
      kernel = centered / denom
    pad = self.padding
    if not isinstance(pad, str):
      pad = [tuple(p) for p in pad]
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=_pair(self.strides), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if self.use_bias:
      y = y + self.param("bias", nn.initializers.zeros, (self.features,))
    return y


class GroupNorm(nn.Module):
  """GroupNorm over the trailing channel dim of an NHWC tensor.

  `msq=False` reproduces `flax.linen.GroupNorm` numerics (centered variance,
  eps outside nothing special, params shaped (C,)); `msq=True` reproduces
  the BiT-paper TF release (mean-of-squares with eps inside the sqrt,
  params shaped (1, 1, 1, C)).
  """
  groups: int = 32
  msq: bool = False
  eps: float = 1e-6
  zero_scale: bool = False

  @nn.compact
  def __call__(self, x):
    shape = x.shape
    c = shape[-1]
    g = x.reshape(shape[:-1] + (self.groups, c // self.groups))
    red = tuple(range(1, g.ndim - 2)) + (g.ndim - 1,)
    mu = jnp.mean(g, axis=red, keepdims=True)
    if self.msq:
      g = g - mu
      g = g * jax.lax.rsqrt(
          jnp.mean(jnp.square(g), axis=red, keepdims=True) + self.eps)
    else:
      var = jnp.mean(jnp.square(g), axis=red, keepdims=True) - jnp.square(mu)
      g = (g - mu) * jax.lax.rsqrt(var + self.eps)
    y = g.reshape(shape)
    pshape = (1,) * (len(shape) - 1) + (c,) if self.msq else (c,)
    sinit = nn.initializers.zeros if self.zero_scale else nn.initializers.ones
    y = y * self.param("scale", sinit, pshape)
    return y + self.param("bias", nn.initializers.zeros, pshape)


def conv_gn(x, features, ksize, strides=1, *, conv, gn, ws="std",
            conv_eps=1e-5, padding="SAME", groups=32, msq=False,
    gn_eps=1e-6, zero_scale=False):
  """WSConv followed by GroupNorm, each under an explicit param name."""
  x = WSConv(features, ksize, strides, padding=padding, ws=ws,
             eps=conv_eps, name=conv)(x)
  return GroupNorm(groups=groups, msq=msq, eps=gn_eps,
                   zero_scale=zero_scale, name=gn)(x)
