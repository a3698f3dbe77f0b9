"""MLP-Mixer (arxiv.org/abs/2105.01601), TPU-first.

Parity target: reference big_vision/models/mlp_mixer.py (S/B/L/H variants,
stochastic depth, public checkpoint loader). Token- and channel-mixing are
the same operation on transposed operands, so one residual-mix loop serves
both; all mixing is plain Dense matmuls — ideal MXU food — and `dtype_mm`
selects bfloat16 compute. Param tree names match the reference for
checkpoint compat.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

import big_vision_tpu.utils as u
from big_vision_tpu.models import common
from big_vision_tpu.models import vit


def _keep_branch(x, drop_p, train, make_rng):
  """Stochastic-depth multiplier: per-example 0/1 on the residual branch."""
  if not (train and drop_p):
    return 1.0
  mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
  return 1.0 - jax.random.bernoulli(make_rng("dropout"), drop_p, mask_shape)


class MlpBlock(nn.Module):
  mlp_dim: int
  dtype_mm: str = "float32"

  @nn.compact
  def __call__(self, x):
    expand, contract = self.mlp_dim, x.shape[-1]
    for width, act in ((expand, nn.gelu), (contract, None)):
      x = nn.Dense(width, dtype=self.dtype_mm)(x)
      x = act(x) if act else x
    return x


class MixerBlock(nn.Module):
  """One token-mix + one channel-mix, each a pre-LN residual branch.

  Both mixes run through the same loop: token mixing is channel mixing on
  the transposed token/channel axes (kernel shapes and the reference's
  param names are unchanged).
  """
  tokens_mlp_dim: int
  channels_mlp_dim: int
  drop_p: float
  dtype_mm: str = "float32"

  @nn.compact
  def __call__(self, x, *, train=False):
    plan = (("token_mixing", self.tokens_mlp_dim, True),
            ("channel_mixing", self.channels_mlp_dim, False))
    for i, (mix_name, width, over_tokens) in enumerate(plan):
      flip = (lambda t: jnp.swapaxes(t, -1, -2)) if over_tokens else (
          lambda t: t)
      branch = MlpBlock(width, self.dtype_mm, name=mix_name)
      y = flip(branch(flip(nn.LayerNorm(name=f"LayerNorm_{i}")(x))))
      x += y * _keep_branch(x, self.drop_p, train, self.make_rng)
    return x


class MlpMixer(nn.Module):
  """Mixer backbone + mean-pool + linear head."""
  # Geometry first (variant-table driven), then head/regularization knobs.
  patch_size: Tuple[int, int]
  hidden_dim: int
  num_blocks: int
  tokens_mlp_dim: int
  channels_mlp_dim: int
  num_classes: Optional[int] = None
  stoch_depth: float = 0.0
  dtype_mm: str = "float32"
  model_name: Optional[str] = None

  def _blocks(self):
    # Stochastic depth ramps linearly: 0 at the stem end, `stoch_depth`
    # at the last block.
    denom = max(self.num_blocks - 1, 1)
    for i in range(self.num_blocks):
      yield i, MixerBlock(self.tokens_mlp_dim, self.channels_mlp_dim,
                          drop_p=self.stoch_depth * i / denom,
                          dtype_mm=self.dtype_mm)

  @nn.compact
  def __call__(self, image, *, train=False):
    out = {}
    # Patchify as reshape+matmul (same param tree as the nn.Conv it
    # replaces; see vit.PatchEmbed for the MXU-efficiency rationale).
    stem = vit.PatchEmbed(self.hidden_dim, self.patch_size,
                          dtype_mm=self.dtype_mm,
                          padding="SAME",  # the nn.Conv default
                          name="stem")
    tokens = out["stem"] = stem(jnp.asarray(image, self.dtype_mm))
    b, width = tokens.shape[0], tokens.shape[-1]
    x = out["input_tokens"] = tokens.reshape(b, -1, width)
    for i, block in self._blocks():
      x = out[f"block_{i}"] = block(x, train=train)
    pooled = nn.LayerNorm(name="pre_head_layer_norm")(x).mean(axis=1)
    out["pre_logits"] = pooled
    if not self.num_classes:
      return pooled, out
    head = nn.Dense(self.num_classes, name="head",
                    kernel_init=nn.initializers.zeros)
    out["logits"] = head(pooled)
    return out["logits"], out


# (hidden_dim, num_blocks, tokens_mlp_dim, channels_mlp_dim) per size.
_VARIANTS = {
    "S": (512, 8, 256, 2048),
    "B": (768, 12, 384, 3072),
    "L": (1024, 24, 512, 4096),
    "H": (1280, 32, 640, 5120),
}

_GEOM_KEYS = ("hidden_dim", "num_blocks", "tokens_mlp_dim",
              "channels_mlp_dim")


def Model(num_classes=None, *, variant=None, **kw):  # pylint: disable=invalid-name
  """Builds a Mixer from a variant string like "B/16"."""
  if variant is None:
    return MlpMixer(num_classes=num_classes, **kw)
  size, _, patch = variant.partition("/")
  geom = dict(zip(_GEOM_KEYS, _VARIANTS[size]),
              patch_size=(int(patch),) * 2)
  return MlpMixer(num_classes=num_classes, **{**geom, **kw})


_PAPER_CKPTS = {
    "B-i1k/16": "gs://mixer_models/imagenet1k/Mixer-B_16.npz",
    "L-i1k/16": "gs://mixer_models/imagenet1k/Mixer-L_16.npz",
    "B-i21k/16": "gs://mixer_models/imagenet21k/Mixer-B_16.npz",
    "L-i21k/16": "gs://mixer_models/imagenet21k/Mixer-L_16.npz",
}


def load(init_params, init_file, model_cfg, dont_load=()):
  """Loads a Mixer checkpoint, incl. the original paper's layout."""
  del model_cfg
  import flax.training.checkpoints
  restored = u.load_params(_PAPER_CKPTS.get(init_file, init_file))
  restored = flax.training.checkpoints.convert_pre_linen(restored)

  if "Mixer" in restored:
    # Original-paper layout: blocks nested under "Mixer" with fused-phase
    # MLP param names. Unfold into this module's tree.
    restored["pre_head_layer_norm"] = restored["Mixer"].pop("encoder_norm")
    restored["stem"] = restored.pop("embedding")

    def unfuse(phase):
      return {f"Dense_{j}": {"bias": phase[f"bias{j + 1}"].squeeze(),
                             "kernel": phase[f"kernel{j + 1}"].squeeze()}
              for j in range(2)}

    for key, block in restored.pop("Mixer").items():
      idx = key.removeprefix("encoderblock_")
      assert idx != key, f"unexpected Mixer entry {key}"
      block["token_mixing"] = unfuse(block.pop("token_mixing_phase_0"))
      block["channel_mixing"] = unfuse(block.pop("channel_mixing_phase_0"))
      restored[f"MixerBlock_{idx}"] = block

  return common.merge_params(restored, init_params, dont_load)
