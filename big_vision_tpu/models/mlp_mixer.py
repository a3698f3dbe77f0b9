"""MLP-Mixer (arxiv.org/abs/2105.01601), TPU-first.

Parity target: reference big_vision/models/mlp_mixer.py (S/B/L/H variants,
stochastic depth, public checkpoint loader). Token- and channel-mixing are
plain Dense matmuls — ideal MXU food; `dtype_mm` selects bfloat16 compute.
Param names match the reference for checkpoint compat.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

import big_vision_tpu.utils as u
from big_vision_tpu.models import common
from big_vision_tpu.models import vit


def _stoch_depth_mask(x, drop_p, deterministic, make_rng):
  """Per-example residual-branch drop mask (stochastic depth)."""
  if not deterministic and drop_p:
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    return 1.0 - jax.random.bernoulli(make_rng("dropout"), drop_p, shape)
  return 1.0


class MlpBlock(nn.Module):
  mlp_dim: int
  dtype_mm: str = "float32"

  @nn.compact
  def __call__(self, x):
    y = nn.Dense(self.mlp_dim, dtype=self.dtype_mm)(x)
    y = nn.gelu(y)
    return nn.Dense(x.shape[-1], dtype=self.dtype_mm)(y)


class MixerBlock(nn.Module):
  """Token-mixing then channel-mixing, both with residuals."""
  tokens_mlp_dim: int
  channels_mlp_dim: int
  drop_p: float
  dtype_mm: str = "float32"

  @nn.compact
  def __call__(self, x, *, train=False):
    y = nn.LayerNorm()(x)
    y = jnp.swapaxes(y, 1, 2)
    y = MlpBlock(self.tokens_mlp_dim, self.dtype_mm, name="token_mixing")(y)
    y = jnp.swapaxes(y, 1, 2)
    x = x + y * _stoch_depth_mask(x, self.drop_p, not train, self.make_rng)
    y = nn.LayerNorm()(x)
    y = MlpBlock(self.channels_mlp_dim, self.dtype_mm,
                 name="channel_mixing")(y)
    return x + y * _stoch_depth_mask(x, self.drop_p, not train, self.make_rng)


class MlpMixer(nn.Module):
  """Mixer backbone + linear head."""
  patch_size: Tuple[int, int]
  num_classes: Optional[int]
  num_blocks: int
  hidden_dim: int
  tokens_mlp_dim: int
  channels_mlp_dim: int
  model_name: Optional[str] = None
  stoch_depth: float = 0.0
  dtype_mm: str = "float32"

  @nn.compact
  def __call__(self, image, *, train=False):
    out = {}
    image = jnp.asarray(image, self.dtype_mm)
    # Patchify as reshape+matmul (same param tree as the nn.Conv it
    # replaces; see vit.PatchEmbed for the MXU-efficiency rationale).
    x = out["stem"] = vit.PatchEmbed(self.hidden_dim, self.patch_size,
                                     dtype_mm=self.dtype_mm,
                                     padding="SAME",  # the nn.Conv default
                                     name="stem")(image)
    n, h, w, c = x.shape
    x = out["input_tokens"] = jnp.reshape(x, [n, h * w, c])
    for i in range(self.num_blocks):
      drop_p = (i / max(self.num_blocks - 1, 1)) * self.stoch_depth
      x = out[f"block_{i}"] = MixerBlock(
          self.tokens_mlp_dim, self.channels_mlp_dim, drop_p,
          self.dtype_mm)(x, train=train)
    x = nn.LayerNorm(name="pre_head_layer_norm")(x)
    x = out["pre_logits"] = jnp.mean(x, axis=1)
    if self.num_classes:
      x = out["logits"] = nn.Dense(
          self.num_classes, kernel_init=nn.initializers.zeros, name="head")(x)
    return x, out


_VARIANTS = {
    "S": dict(hidden_dim=512, num_blocks=8, channels_mlp_dim=2048,
              tokens_mlp_dim=256),
    "B": dict(hidden_dim=768, num_blocks=12, channels_mlp_dim=3072,
              tokens_mlp_dim=384),
    "L": dict(hidden_dim=1024, num_blocks=24, channels_mlp_dim=4096,
              tokens_mlp_dim=512),
    "H": dict(hidden_dim=1280, num_blocks=32, channels_mlp_dim=5120,
              tokens_mlp_dim=640),
}


def Model(num_classes=None, *, variant=None, **kw):  # pylint: disable=invalid-name
  if variant is not None:
    size, patch = variant.split("/")
    kw.setdefault("patch_size", (int(patch), int(patch)))
    for k, v in _VARIANTS[size].items():
      kw.setdefault(k, v)
  return MlpMixer(num_classes=num_classes, **kw)


def load(init_params, init_file, model_cfg, dont_load=()):
  """Loads a Mixer checkpoint, incl. the original paper's layout."""
  del model_cfg
  init_file = {
      "B-i1k/16": "gs://mixer_models/imagenet1k/Mixer-B_16.npz",
      "L-i1k/16": "gs://mixer_models/imagenet1k/Mixer-L_16.npz",
      "B-i21k/16": "gs://mixer_models/imagenet21k/Mixer-B_16.npz",
      "L-i21k/16": "gs://mixer_models/imagenet21k/Mixer-L_16.npz",
  }.get(init_file, init_file)
  import flax.training.checkpoints
  restored = u.load_params(init_file)
  restored = flax.training.checkpoints.convert_pre_linen(restored)

  if "Mixer" in restored:
    # Original-paper layout -> current layout.
    restored["pre_head_layer_norm"] = restored["Mixer"].pop("encoder_norm")
    restored["stem"] = restored.pop("embedding")

    def split_fused(d):
      return {
          "Dense_0": {"bias": d["bias1"].squeeze(),
                      "kernel": d["kernel1"].squeeze()},
          "Dense_1": {"bias": d["bias2"].squeeze(),
                      "kernel": d["kernel2"].squeeze()},
      }
    for k, v in restored["Mixer"].items():
      assert k.startswith("encoderblock_"), k
      v["token_mixing"] = split_fused(v.pop("token_mixing_phase_0"))
      v["channel_mixing"] = split_fused(v.pop("channel_mixing_phase_0"))
      restored["MixerBlock_" + k[len("encoderblock_"):]] = v
    del restored["Mixer"]

  return common.merge_params(restored, init_params, dont_load)
