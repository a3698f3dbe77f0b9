"""Jet: a normalizing flow built from ViT-parameterized affine couplings.

Parity target: reference models/proj/jet/jet.py (arxiv.org/abs/2412.15129)
— alternating channel-wise (random permutation) and spatial (checkerboard
/ stripes) couplings, exact log-determinants, `forward` images -> latents
and `inverse` back. Verified equal to the reference to <=1e-5 in
tests/test_reference_parity.py::TestModelParity::test_jet.

The internals are organized for TPU rather than transcribed:

  * Permutations are applied as GATHERS. The reference multiplies by
    [C, C] / [N, N] one-hot matrices at precision="highest" — O(C^2)
    MXU work (and f32 MXU at that) for what is a data movement. The
    one-hot mask parameters are kept (their *-FREEZE_ME names and shapes
    are the checkpoint contract) but each layer reads them back into
    index vectors and uses jnp.take, which XLA lowers to a dynamic-gather
    — O(C), no matmul, bit-identical output for 0/1 masks.
  * One Coupling module exposes `partition`/`combine` (kind-dispatched via
    lax.cond on the traced layer kind) and a single `transform(x, invert)`
    entry; forward and inverse share one scanned body parameterized by
    direction, scanned in reverse for sampling.
  * The whole depth is one nn.scan over a single remat'd Coupling — one
    compiled layer regardless of depth (the right TPU shape).
"""

from __future__ import annotations

import itertools
from typing import Sequence

import einops
import flax.core
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.models import common, vit


def load(init_params, init_file, model_params=None, dont_load=()):
  del model_params
  ckpt = flax.core.unfreeze(u.load_params(init_file))
  if init_params is None:
    return ckpt
  return common.merge_params(ckpt, init_params, dont_load)


def _grid_halves(kind, nh, nw):
  """Boolean partition-A membership of each token for a spatial kind."""
  tok = np.arange(nh * nw)
  patterns = {
      "vstripes": tok % 2,
      "hstripes": (tok // nw) % 2,
      "checkerboard": (tok + tok // nw) % 2,
  }
  base = kind.removesuffix("-inv")
  if base not in patterns:
    raise ValueError(f"Unknown coupling kind {kind!r}")
  in_a = patterns[base] == 0
  return ~in_a if kind.endswith("-inv") else in_a


def get_spatial_coupling_init(depth, image_shape, ps, proj_kinds):
  """[depth, N, N] one-hot masks splitting the token grid in half.

  The first N/2 output slots hold partition A, the rest partition B:
  vstripes/hstripes alternate columns/rows of patches, checkerboard
  alternates diagonally; "-inv" swaps the partitions.
  """
  assert image_shape[-3] % ps == 0 and image_shape[-2] % ps == 0
  nh, nw = (side // ps for side in image_shape[-3:-1])
  n = nh * nw

  def _init(key, dtype):
    del key
    w = np.zeros((depth, n, n), np.float64)
    for i, kind in enumerate(proj_kinds):
      if kind == "zero":
        continue
      in_a = _grid_halves(kind, nh, nw)
      tok = np.arange(n)
      w[i, tok[in_a], np.arange(n // 2)] = 1.0
      w[i, tok[~in_a], np.arange(n // 2, n)] = 1.0
    return jnp.asarray(w, dtype)

  return _init


def get_channels_coupling_init(depth, image_shape, ps, proj_kinds):
  """[depth, C, C] one-hot masks; "random" = seeded permutation."""
  assert image_shape[-3] % ps == 0 and image_shape[-2] % ps == 0
  c = image_shape[-1] * ps * ps

  def _init(key, dtype):
    def one_layer(i, kind):
      if kind == "zero":
        return jnp.zeros((c, c), dtype)
      if kind != "random":
        raise ValueError(f"Unknown coupling kind {kind!r}")
      # key is traced during init, so the permutation stays in jnp.
      p = jax.random.permutation(jax.random.fold_in(key, i), c)
      return jnp.zeros((c, c), dtype).at[p, jnp.arange(c)].set(1)
    return jnp.stack([one_layer(i, k) for i, k in enumerate(proj_kinds)])

  return _init


def _mask_to_perm(mask):
  """Recovers gather indices from a one-hot permutation mask.

  mask[k, m] == 1 means output slot m reads input slot k (the reference
  computes out = x @ mask). Returns (fwd_idx, inv_idx) so that
  x.take(fwd_idx) == x @ mask and x.take(inv_idx) == x @ mask.T.
  """
  return jnp.argmax(mask, axis=0), jnp.argmax(mask, axis=1)


class DNN(nn.Module):
  """Non-invertible conditioner: ViT over the visible half -> (bias, scale).

  Param names (init_proj / posemb / vit / final_proj and the optional
  context cross-attention) are the checkpoint contract with the reference
  (ref jet.py:34-66); the zero-init of final_proj makes every coupling
  start as the identity, which keeps early training stable.
  """
  emb_dim: int = 256
  depth: int = 1
  num_heads: int = 4

  @nn.compact
  def __call__(self, x, context=None):
    out_dim = x.shape[-1]
    h = nn.Dense(self.emb_dim, name="init_proj")(x)
    posemb_init = nn.initializers.normal(stddev=self.emb_dim ** -0.5)
    h += self.param("posemb", posemb_init, (1,) + h.shape[1:], jnp.float32)

    if context is not None:
      xattn = nn.MultiHeadDotProductAttention(
          num_heads=self.num_heads, qkv_features=self.emb_dim,
          out_features=h.shape[-1],
          out_kernel_init=nn.initializers.zeros)
      h += xattn(h, context)

    trunk = vit.Encoder(depth=self.depth, num_heads=self.num_heads,
                        name="vit")
    h, _ = trunk(h)
    raw = nn.Dense(2 * out_dim, kernel_init=nn.initializers.zeros,
                   name="final_proj")(h)
    return raw[..., :out_dim], raw[..., out_dim:]


class Coupling(nn.Module):
  """Affine coupling over tokens; kind 1 = channel split, 0 = spatial."""
  emb_dim: int = 256
  depth: int = 1
  num_heads: int = 4
  scale_factor: float = 2.0

  # Spatial halves carry full token count at half width so the conditioner
  # sees every position; these fold/unfold the channel axis accordingly.
  _thin = staticmethod(
      lambda t: einops.rearrange(t, "... n (s c) -> ... (n s) c", s=2))
  _fat = staticmethod(
      lambda t: einops.rearrange(t, "... (n s) c -> ... n (s c)", s=2))

  def partition(self, x, kind, channel_mask, spatial_mask):
    """Splits x [B, N, K] into visible/transformed halves by `kind`."""

    def by_channels(x):
      fwd, _ = _mask_to_perm(channel_mask)
      permuted = jnp.take(x, fwd, axis=-1)
      half = permuted.shape[-1] // 2
      return permuted[..., :half], permuted[..., half:]

    def by_space(x):
      fwd, _ = _mask_to_perm(spatial_mask)
      a, b = jnp.split(jnp.take(x, fwd, axis=-2), 2, axis=-2)
      return self._thin(a), self._thin(b)

    return jax.lax.cond(kind, by_channels, by_space, x)

  def combine(self, x1, x2, kind, channel_mask, spatial_mask):
    """Inverse of partition (uses the transposed permutation)."""

    def by_channels(x1, x2):
      _, inv = _mask_to_perm(channel_mask)
      return jnp.take(jnp.concatenate([x1, x2], axis=-1), inv, axis=-1)

    def by_space(x1, x2):
      _, inv = _mask_to_perm(spatial_mask)
      stacked = jnp.concatenate([self._fat(x1), self._fat(x2)], axis=-2)
      return jnp.take(stacked, inv, axis=-2)

    return jax.lax.cond(kind, by_channels, by_space, x1, x2)

  @nn.compact
  def transform(self, x, invert, kind, channel_mask, spatial_mask,
                context=None):
    """One coupling step; invert=True runs the exact inverse map.

    y2 = (x2 + bias) * scale with scale = sigmoid(raw) * scale_factor;
    log|det| = sum log scale, negated for the inverse direction.
    """
    x1, x2 = self.partition(x, kind, channel_mask, spatial_mask)
    conditioner = DNN(depth=self.depth, emb_dim=self.emb_dim,
                      num_heads=self.num_heads, name="dnn")
    bias, raw_scale = conditioner(x1, context)
    scale = jax.nn.sigmoid(raw_scale) * self.scale_factor
    x2 = (x2 / scale - bias) if invert else (x2 + bias) * scale
    logdet = jnp.log(self.scale_factor) + jax.nn.log_sigmoid(raw_scale)
    logdet = jnp.sum(logdet, axis=range(1, logdet.ndim))
    y = self.combine(x1, x2, kind, channel_mask, spatial_mask)
    return y, (-logdet if invert else logdet)

  def forward(self, x, kind, channel_mask, spatial_mask, context=None):
    return self.transform(x, False, kind, channel_mask, spatial_mask,
                          context)

  def inverse(self, x, kind, channel_mask, spatial_mask, context=None):
    return self.transform(x, True, kind, channel_mask, spatial_mask,
                          context)


class Model(nn.Module):
  """Jet flow: one scanned Coupling over `depth` mixed-kind layers."""
  # Flow geometry.
  depth: int = 2
  ps: int = 4
  kinds: Sequence[str] = ("channels", "channels", "spatial")
  channels_coupling_projs: Sequence[str] = ("random",)
  spatial_coupling_projs: Sequence[str] = ("checkerboard",
                                           "checkerboard-inv")
  # Per-coupling conditioner geometry.
  block_depth: int = 1
  emb_dim: int = 256
  num_heads: int = 4
  scale_factor: float = 2.0

  def _layer_plan(self):
    """Per-layer (kind_flag, channel_proj_kind, spatial_proj_kind)."""
    pools = {"channels": itertools.cycle(self.channels_coupling_projs),
             "spatial": itertools.cycle(self.spatial_coupling_projs)}
    plan = []
    for k in itertools.islice(itertools.cycle(self.kinds), self.depth):
      if k not in pools:
        raise ValueError(f"Unknown coupling kind {k!r}")
      proj = next(pools[k])
      plan.append((1, proj, "zero") if k == "channels"
                  else (0, "zero", proj))
    return zip(*plan)

  @nn.compact
  def _run(self, x, invert, context=None):
    kind_flags, c_kinds, s_kinds = self._layer_plan()
    kind_flags = jnp.array(kind_flags)
    # The masks live as [depth, n, n] one-hot parameters — frozen by the
    # optimizer (FREEZE_ME) and stored in checkpoints, matching the
    # reference layout; each scanned layer turns its slice into indices.
    mask_inits = {
        "channel_coupling_masks-FREEZE_ME": get_channels_coupling_init(
            self.depth, x.shape[1:], self.ps, c_kinds),
        "spatial_coupling_masks-FREEZE_ME": get_spatial_coupling_init(
            self.depth, x.shape[1:], self.ps, s_kinds),
    }
    c_masks, s_masks = (self.param(name, init, jnp.float32)
                        for name, init in mask_inits.items())

    remat_coupling = nn.remat(
        Coupling, prevent_cse=False,
        policy=jax.checkpoint_policies.nothing_saveable,
        methods=("forward", "inverse"))
    layer = remat_coupling(name="couplings", depth=self.block_depth,
                           emb_dim=self.emb_dim, num_heads=self.num_heads,
                           scale_factor=self.scale_factor)

    def body(m, carry, kind, c, s, context):
      # Direction is a python constant here, so one body serves both
      # maps; the inverse simply scans the layers in reverse.
      step = m.inverse if invert else m.forward
      return step(carry, kind, c, s, context)

    scan_kw = dict(variable_axes={"params": 0},
                   in_axes=(0, 0, 0, nn.broadcast),
                   split_rngs={"params": True})
    scanned = nn.scan(body, length=self.depth, reverse=invert, **scan_kw)

    tokens = einops.rearrange(
        x, "b (h hp) (w wp) c -> b (h w) (hp wp c)", hp=self.ps, wp=self.ps)
    tokens, logdets = scanned(layer, tokens, kind_flags, c_masks, s_masks,
                              context)
    grid = int(np.round(tokens.shape[1] ** 0.5))
    out = einops.rearrange(
        tokens, "b (h w) (hp wp c) -> b (h hp) (w wp) c",
        hp=self.ps, wp=self.ps, h=grid)
    return out, jnp.sum(logdets, axis=0)

  def forward(self, x, context=None):
    """Images -> latents, with sum of per-layer log-determinants."""
    return self._run(x, False, context)

  def inverse(self, x, context=None):
    """Latents -> images (exact inverse; layers in reverse order)."""
    return self._run(x, True, context)

  def __call__(self, x, context=None):
    return self.forward(x, context)
