"""Jet: a normalizing flow built from ViT-parameterized affine couplings.

Parity target: reference models/proj/jet/jet.py (arxiv.org/abs/2412.15129):
alternating channel-wise (random permutation) and spatial (checkerboard /
stripes) couplings, scanned over depth with remat; exact log-determinants;
`forward` maps images -> latents, `inverse` samples back.

Both coupling kinds run through one scanned module (selected per layer with
lax.cond on a traced kind flag) so the whole flow is a single compiled scan
— the reference's design, which is exactly the right TPU shape.
"""

from __future__ import annotations

import itertools
from typing import Any, Sequence

import einops
import flax.core
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.models import common, vit


class DNN(nn.Module):
  """Non-invertible conditioner: ViT predicting (bias, scale)."""
  depth: int = 1
  emb_dim: int = 256
  num_heads: int = 4

  @nn.compact
  def __call__(self, x, context=None):
    out_dim = x.shape[-1]
    x = nn.Dense(self.emb_dim, name="init_proj")(x)
    posemb = self.param(
        "posemb", nn.initializers.normal(stddev=1 / np.sqrt(self.emb_dim)),
        (1,) + x.shape[1:], jnp.float32)
    x = x + posemb

    if context is not None:
      y = nn.MultiHeadDotProductAttention(
          num_heads=self.num_heads, qkv_features=self.emb_dim,
          out_kernel_init=nn.initializers.zeros,
          out_features=x.shape[-1])(x, context)
      x = x + y

    x, _ = vit.Encoder(depth=self.depth, num_heads=self.num_heads,
                       name="vit")(x)
    bias, scale = jnp.split(
        nn.Dense(2 * out_dim, kernel_init=nn.initializers.zeros,
                 name="final_proj")(x), 2, axis=-1)
    return bias, scale


class Coupling(nn.Module):
  """Affine coupling, channel-wise (kind=1) or spatial (kind=0).

  One module does both: both projections are applied via lax.cond on the
  traced `kind` so nn.scan can loop a single instance over mixed layers.
  """
  depth: int = 1
  emb_dim: int = 256
  num_heads: int = 4
  scale_factor: float = 2.0

  @nn.compact
  def compact_setup(self, x, kind, channel_proj, spatial_proj,
                    context=None):
    dnn = DNN(depth=self.depth, emb_dim=self.emb_dim,
              num_heads=self.num_heads, name="dnn")

    def split_channels(x):
      x = jnp.einsum("ntk,km->ntm", x, channel_proj, precision="highest")
      return tuple(jnp.split(x, 2, axis=-1))

    def merge_channels(x1, x2):
      x = jnp.concatenate([x1, x2], axis=-1)
      return jnp.einsum("ntk,km->ntm", x, channel_proj.T,
                        precision="highest")

    def split_spatial(x):
      x = jnp.einsum("ntk,tm->nmk", x, spatial_proj, precision="highest")
      x1, x2 = jnp.split(x, 2, axis=-2)
      cut = lambda a: einops.rearrange(a, "... n (s c) -> ... (n s) c", s=2)
      return cut(x1), cut(x2)

    def merge_spatial(x1, x2):
      uncut = lambda a: einops.rearrange(a, "... (n s) c -> ... n (s c)",
                                         s=2)
      x = jnp.concatenate([uncut(x1), uncut(x2)], axis=-2)
      return jnp.einsum("ntk,tm->nmk", x, spatial_proj.T,
                        precision="highest")

    x1, x2 = jax.lax.cond(kind, split_channels, split_spatial, x)
    bias, raw_scale = dnn(x1, context)
    scale = jax.nn.sigmoid(raw_scale) * self.scale_factor
    logdet = jax.nn.log_sigmoid(raw_scale) + jnp.log(self.scale_factor)
    logdet = jnp.sum(logdet, axis=range(1, logdet.ndim))
    return x1, x2, bias, scale, merge_channels, merge_spatial, logdet

  def forward(self, x, kind, channel_proj, spatial_proj, context=None):
    x1, x2, bias, scale, merge_c, merge_s, logdet = self.compact_setup(
        x, kind, channel_proj, spatial_proj, context)
    x2 = (x2 + bias) * scale
    x = jax.lax.cond(kind, merge_c, merge_s, x1, x2)
    return x, logdet

  def inverse(self, x, kind, channel_proj, spatial_proj, context=None):
    x1, x2, bias, scale, merge_c, merge_s, logdet = self.compact_setup(
        x, kind, channel_proj, spatial_proj, context)
    x2 = (x2 / scale) - bias
    x = jax.lax.cond(kind, merge_c, merge_s, x1, x2)
    return x, -logdet


class Model(nn.Module):
  """Jet flow: stack of couplings over patch tokens."""
  depth: int = 2
  block_depth: int = 1
  emb_dim: int = 256
  num_heads: int = 4
  scale_factor: float = 2.0
  ps: int = 4
  channels_coupling_projs: Sequence[str] = ("random",)
  spatial_coupling_projs: Sequence[str] = ("checkerboard",
                                           "checkerboard-inv")
  kinds: Sequence[str] = ("channels", "channels", "spatial")

  @nn.compact
  def compact_setup(self, x):
    def _interleave():
      kinds = itertools.cycle(self.kinds)
      cc = itertools.cycle(self.channels_coupling_projs)
      sc = itertools.cycle(self.spatial_coupling_projs)
      while True:
        k = next(kinds)
        if k == "channels":
          yield 1, next(cc), "zero"
        elif k == "spatial":
          yield 0, "zero", next(sc)
        else:
          raise ValueError(f"Unknown coupling kind {k!r}")

    kinds, c_kinds, s_kinds = zip(
        *itertools.islice(_interleave(), self.depth))
    kinds = jnp.array(kinds)

    c_proj = self.param(
        "channel_coupling_masks-FREEZE_ME",
        get_channels_coupling_init(self.depth, x.shape[1:], self.ps,
                                   c_kinds), jnp.float32)
    s_proj = self.param(
        "spatial_coupling_masks-FREEZE_ME",
        get_spatial_coupling_init(self.depth, x.shape[1:], self.ps,
                                  s_kinds), jnp.float32)

    remat_coupling = nn.remat(
        Coupling, prevent_cse=False,
        policy=jax.checkpoint_policies.nothing_saveable,
        methods=("forward", "inverse"))
    block = remat_coupling(
        name="couplings", depth=self.block_depth, emb_dim=self.emb_dim,
        num_heads=self.num_heads, scale_factor=self.scale_factor)

    def body_forward(m, carry, kind, c, s, context):
      return m.forward(carry, kind, c, s, context)

    def body_inverse(m, carry, kind, c, s, context):
      return m.inverse(carry, kind, c, s, context)

    scan_kwargs = dict(
        variable_axes={"params": 0},
        in_axes=(0, 0, 0, nn.broadcast),
        split_rngs={"params": True},
        length=self.depth)
    m_forward = nn.scan(body_forward, **scan_kwargs)
    m_inverse = nn.scan(body_inverse, **scan_kwargs, reverse=True)
    return block, m_forward, m_inverse, kinds, c_proj, s_proj

  def _to_tokens(self, x):
    return einops.rearrange(x, "b (h hp) (w wp) c -> b (h w) (hp wp c)",
                            hp=self.ps, wp=self.ps)

  def _from_tokens(self, x):
    h = int(np.round(x.shape[1] ** 0.5))
    return einops.rearrange(x, "b (h w) (hp wp c) -> b (h hp) (w wp) c",
                            hp=self.ps, wp=self.ps, h=h)

  def forward(self, x, context=None):
    block, m_forward, _, kinds, c_projs, s_projs = self.compact_setup(x)
    x = self._to_tokens(x)
    x, logdet = m_forward(block, x, kinds, c_projs, s_projs, context)
    return self._from_tokens(x), jnp.sum(logdet, axis=0)

  def inverse(self, x, context=None):
    block, _, m_inverse, kinds, c_projs, s_projs = self.compact_setup(x)
    x = self._to_tokens(x)
    x, logdet = m_inverse(block, x, kinds, c_projs, s_projs, context)
    return self._from_tokens(x), jnp.sum(logdet, axis=0)

  def __call__(self, x, context=None):
    return self.forward(x, context)


def get_channels_coupling_init(depth, image_shape, ps, proj_kinds):
  assert image_shape[-3] % ps == 0 and image_shape[-2] % ps == 0
  c = image_shape[-1] * ps * ps

  def _init(k, dtype):
    w = jnp.zeros((depth, c, c), dtype=dtype)
    for i, kind in enumerate(proj_kinds):
      if kind == "random":
        p = jax.random.permutation(jax.random.fold_in(k, i), c)
        w = w.at[jnp.ones_like(p) * i, p, jnp.arange(c)].set(1.0)
      elif kind == "zero":
        pass
      else:
        raise ValueError(f"Unknown coupling kind {kind!r}")
    return w
  return _init


def get_spatial_coupling_init(depth, image_shape, ps, proj_kinds):
  assert image_shape[-3] % ps == 0 and image_shape[-2] % ps == 0
  nh, nw = image_shape[-3] // ps, image_shape[-2] // ps
  n = nh * nw

  def _init(k, dtype):
    del k
    w = jnp.zeros((depth, n, n), dtype=dtype)
    for i, kind in enumerate(proj_kinds):
      if kind.startswith("vstripes"):
        idx1 = jnp.arange(n)[::2]
        idx2 = jnp.arange(1, n)[::2]
      elif kind.startswith("hstripes"):
        idx1 = jnp.where((jnp.arange(n) // nw) % 2 == 0, size=n // 2)[0]
        idx2 = jnp.where((jnp.arange(n) // nw) % 2 == 1, size=n // 2)[0]
      elif kind.startswith("checkerboard"):
        vals = (jnp.arange(n).reshape([nh, nw])
                + jnp.arange(nh).reshape([nh, 1]))
        idx1 = jnp.where((vals.flatten() % 2) == 0, size=n // 2)[0]
        idx2 = jnp.where((vals.flatten() % 2) == 1, size=n // 2)[0]
      elif kind == "zero":
        continue
      else:
        raise ValueError(f"Unknown coupling kind {kind!r}")
      idx1, idx2 = (idx2, idx1) if kind.endswith("-inv") else (idx1, idx2)
      w = w.at[i, idx1, jnp.arange(n // 2)].set(1)
      w = w.at[i, idx2, jnp.arange(n // 2, n)].set(1)
    return w
  return _init


def load(init_params, init_file, model_params=None, dont_load=()):
  del model_params
  ckpt = flax.core.unfreeze(u.load_params(init_file))
  if init_params is not None:
    ckpt = common.merge_params(ckpt, init_params, dont_load)
  return ckpt
