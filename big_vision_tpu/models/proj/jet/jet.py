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
  depth: int = 1
  emb_dim: int = 256
  num_heads: int = 4

  @nn.compact
  def __call__(self, x, context=None):
    out_dim = x.shape[-1]
    h = nn.Dense(self.emb_dim, name="init_proj")(x)
    h = h + self.param(
        "posemb", nn.initializers.normal(stddev=1 / np.sqrt(self.emb_dim)),
        (1,) + h.shape[1:], jnp.float32)

    if context is not None:
      h = h + nn.MultiHeadDotProductAttention(
          num_heads=self.num_heads, qkv_features=self.emb_dim,
          out_kernel_init=nn.initializers.zeros,
          out_features=h.shape[-1])(h, context)

    h, _ = vit.Encoder(depth=self.depth, num_heads=self.num_heads,
                       name="vit")(h)
    raw = nn.Dense(2 * out_dim, kernel_init=nn.initializers.zeros,
                   name="final_proj")(h)
    return raw[..., :out_dim], raw[..., out_dim:]


class Coupling(nn.Module):
  """Affine coupling over tokens; kind 1 = channel split, 0 = spatial."""
  depth: int = 1
  emb_dim: int = 256
  num_heads: int = 4
  scale_factor: float = 2.0

  def partition(self, x, kind, channel_mask, spatial_mask):
    """Splits x [B, N, K] into visible/transformed halves by `kind`."""

    def by_channels(x):
      fwd, _ = _mask_to_perm(channel_mask)
      x = jnp.take(x, fwd, axis=-1)
      return x[..., :x.shape[-1] // 2], x[..., x.shape[-1] // 2:]

    def by_space(x):
      fwd, _ = _mask_to_perm(spatial_mask)
      x = jnp.take(x, fwd, axis=-2)
      a, b = jnp.split(x, 2, axis=-2)
      # Halve the channel dim so each half keeps the full token count
      # (the conditioner then sees every spatial position).
      thin = lambda t: einops.rearrange(t, "... n (s c) -> ... (n s) c",
                                        s=2)
      return thin(a), thin(b)

    return jax.lax.cond(kind, by_channels, by_space, x)

  def combine(self, x1, x2, kind, channel_mask, spatial_mask):
    """Inverse of partition (uses the transposed permutation)."""

    def by_channels(x1, x2):
      _, inv = _mask_to_perm(channel_mask)
      return jnp.take(jnp.concatenate([x1, x2], axis=-1), inv, axis=-1)

    def by_space(x1, x2):
      _, inv = _mask_to_perm(spatial_mask)
      fat = lambda t: einops.rearrange(t, "... (n s) c -> ... n (s c)",
                                       s=2)
      x = jnp.concatenate([fat(x1), fat(x2)], axis=-2)
      return jnp.take(x, inv, axis=-2)

    return jax.lax.cond(kind, by_channels, by_space, x1, x2)

  @nn.compact
  def transform(self, x, invert, kind, channel_mask, spatial_mask,
                context=None):
    """One coupling step; invert=True runs the exact inverse map.

    y2 = (x2 + bias) * scale with scale = sigmoid(raw) * scale_factor;
    log|det| = sum log scale, negated for the inverse direction.
    """
    x1, x2 = self.partition(x, kind, channel_mask, spatial_mask)
    bias, raw_scale = DNN(depth=self.depth, emb_dim=self.emb_dim,
                          num_heads=self.num_heads, name="dnn")(x1, context)
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

  def _layer_plan(self):
    """Per-layer (kind_flag, channel_proj_kind, spatial_proj_kind)."""
    kinds = itertools.cycle(self.kinds)
    cc = itertools.cycle(self.channels_coupling_projs)
    sc = itertools.cycle(self.spatial_coupling_projs)
    plan = []
    for _ in range(self.depth):
      k = next(kinds)
      if k == "channels":
        plan.append((1, next(cc), "zero"))
      elif k == "spatial":
        plan.append((0, "zero", next(sc)))
      else:
        raise ValueError(f"Unknown coupling kind {k!r}")
    return zip(*plan)

  @nn.compact
  def _run(self, x, invert, context=None):
    kind_flags, c_kinds, s_kinds = self._layer_plan()
    kind_flags = jnp.array(kind_flags)
    # The masks live as [depth, n, n] one-hot parameters — frozen by the
    # optimizer (FREEZE_ME) and stored in checkpoints, matching the
    # reference layout; each scanned layer turns its slice into indices.
    c_masks = self.param(
        "channel_coupling_masks-FREEZE_ME",
        get_channels_coupling_init(self.depth, x.shape[1:], self.ps,
                                   c_kinds), jnp.float32)
    s_masks = self.param(
        "spatial_coupling_masks-FREEZE_ME",
        get_spatial_coupling_init(self.depth, x.shape[1:], self.ps,
                                  s_kinds), jnp.float32)

    layer = nn.remat(
        Coupling, prevent_cse=False,
        policy=jax.checkpoint_policies.nothing_saveable,
        methods=("forward", "inverse"))(
            name="couplings", depth=self.block_depth, emb_dim=self.emb_dim,
            num_heads=self.num_heads, scale_factor=self.scale_factor)

    def body(m, carry, kind, c, s, context):
      # Direction is a python constant here, so one body serves both
      # maps; the inverse simply scans the layers in reverse.
      if invert:
        return m.inverse(carry, kind, c, s, context)
      return m.forward(carry, kind, c, s, context)

    scanned = nn.scan(
        body,
        variable_axes={"params": 0},
        in_axes=(0, 0, 0, nn.broadcast),
        split_rngs={"params": True},
        length=self.depth,
        reverse=invert)

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


def get_channels_coupling_init(depth, image_shape, ps, proj_kinds):
  """[depth, C, C] one-hot masks; "random" = seeded permutation."""
  assert image_shape[-3] % ps == 0 and image_shape[-2] % ps == 0
  c = image_shape[-1] * ps * ps

  def _init(key, dtype):
    layers = []
    for i, kind in enumerate(proj_kinds):
      if kind == "random":
        # key is traced during init, so the permutation stays in jnp.
        p = jax.random.permutation(jax.random.fold_in(key, i), c)
        layers.append(jnp.zeros((c, c), dtype).at[p, jnp.arange(c)].set(1))
      elif kind == "zero":
        layers.append(jnp.zeros((c, c), dtype))
      else:
        raise ValueError(f"Unknown coupling kind {kind!r}")
    return jnp.stack(layers)

  return _init


def get_spatial_coupling_init(depth, image_shape, ps, proj_kinds):
  """[depth, N, N] one-hot masks splitting the token grid in half.

  The first N/2 output slots hold partition A, the rest partition B:
  vstripes/hstripes alternate columns/rows of patches, checkerboard
  alternates diagonally; "-inv" swaps the partitions.
  """
  assert image_shape[-3] % ps == 0 and image_shape[-2] % ps == 0
  nh, nw = image_shape[-3] // ps, image_shape[-2] // ps
  n = nh * nw

  def _init(key, dtype):
    del key
    w = np.zeros((depth, n, n), np.float64)
    tok = np.arange(n)
    for i, kind in enumerate(proj_kinds):
      if kind.startswith("vstripes"):
        in_a = tok % 2 == 0
      elif kind.startswith("hstripes"):
        in_a = (tok // nw) % 2 == 0
      elif kind.startswith("checkerboard"):
        in_a = (tok + tok // nw) % 2 == 0
      elif kind == "zero":
        continue
      else:
        raise ValueError(f"Unknown coupling kind {kind!r}")
      if kind.endswith("-inv"):
        in_a = ~in_a
      w[i, tok[in_a], np.arange(n // 2)] = 1.0
      w[i, tok[~in_a], np.arange(n // 2, n)] = 1.0
    return jnp.asarray(w, dtype)

  return _init


def load(init_params, init_file, model_params=None, dont_load=()):
  del model_params
  ckpt = flax.core.unfreeze(u.load_params(init_file))
  if init_params is not None:
    ckpt = common.merge_params(ckpt, init_params, dont_load)
  return ckpt
