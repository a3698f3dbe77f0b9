"""BiT ResNet-V1: post-activation bottlenecks with GroupNorm + WS.

Behavior parity with reference models/bit.py (stage tables for depths
26/50/101/152/200, width multiplier, feature taps, zero-init final GN and
head, legacy pre-linen checkpoint fixup). Built on the shared TPU-first
primitives in models/convnets.py: convs go straight to lax conv in
NHWC/HWIO, weight standardization fuses into the conv prologue.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import flax
import flax.linen as nn
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.models import common
from big_vision_tpu.models import convnets as cn

# Bottleneck-block counts per named depth. 18/34 are absent on purpose:
# they need the non-bottleneck block this family doesn't define.
STAGE_PLAN = {
    26: [2, 2, 2, 2],
    50: [3, 4, 6, 3],
    101: [3, 4, 23, 3],
    152: [3, 8, 36, 3],
    200: [3, 24, 36, 3],
}


def get_block_desc(depth):
  if isinstance(depth, list):
    depth = tuple(depth)
  return STAGE_PLAN.get(depth, depth)


class ResidualUnit(nn.Module):
  """1x1 -> 3x3(stride) -> 1x1 bottleneck; GN after each conv, post-act."""
  nmid: Optional[int] = None
  strides: Sequence[int] = (1, 1)

  @nn.compact
  def __call__(self, x):
    mid = self.nmid or x.shape[-1] // 4
    wide = 4 * mid
    stride = tuple(self.strides)

    shortcut = x
    if stride != (1, 1) or x.shape[-1] != wide:
      shortcut = cn.conv_gn(x, wide, 1, stride, conv="conv_proj",
                            gn="gn_proj")

    # The whole unit as a spec table: (conv, gn, feats, k, stride, zero-GN).
    # The final GN is zero-init so a fresh unit starts as identity.
    plan = [("conv1", "gn1", mid, 1, (1, 1), False),
            ("conv2", "gn2", mid, 3, stride, False),
            ("conv3", "gn3", wide, 1, (1, 1), True)]
    y = x
    for cname, gname, feats, k, s, last in plan:
      y = cn.conv_gn(y, feats, k, s, conv=cname, gn=gname, zero_scale=last)
      if not last:
        y = nn.relu(y)
    return nn.relu(shortcut + y)


class ResNetStage(nn.Module):
  block_size: int
  first_stride: Sequence[int] = (1, 1)
  nmid: Optional[int] = None

  @nn.compact
  def __call__(self, x):
    for i in range(self.block_size):
      stride = self.first_stride if i == 0 else (1, 1)
      x = ResidualUnit(self.nmid, strides=stride, name=f"unit{i + 1}")(x)
    return x


class Model(nn.Module):
  """ResNetV1 with GN+WS (the BiT recipe)."""
  num_classes: Optional[int] = None
  width: float = 1
  depth: Union[int, Sequence[int]] = 50

  @nn.compact
  def __call__(self, image, *, train=False):
    del train
    plan = get_block_desc(self.depth)
    base = int(64 * self.width)
    taps = {}

    x = cn.conv_gn(image, base, 7, (2, 2), conv="conv_root", gn="gn_root")
    x = nn.max_pool(nn.relu(x), (3, 3), strides=(2, 2), padding="SAME")
    taps["stem"] = x

    for i, nblocks in enumerate(plan):
      x = ResNetStage(nblocks, nmid=base * 2 ** i,
                      first_stride=(1, 1) if i == 0 else (2, 2),
                      name=f"block{i + 1}")(x)
      taps[f"stage{i + 1}"] = x

    taps["pre_logits_2d"] = x
    x = taps["pre_logits"] = jnp.mean(x, axis=(1, 2))

    if self.num_classes:
      head = nn.Dense(self.num_classes, name="head",
                      kernel_init=nn.initializers.zeros)
      taps["logits_2d"] = head(taps["pre_logits_2d"])
      x = taps["logits"] = head(x)
    return x, taps


def fix_old_checkpoints(params):
  """Squeezes pre-linen GroupNorm param shapes down to (C,)."""
  import flax.training.checkpoints
  params = flax.core.unfreeze(
      flax.training.checkpoints.convert_pre_linen(params))
  gn_names = {"gn_root", "gn_proj", "gn1", "gn2", "gn3"}
  flat = flax.traverse_util.flatten_dict(params)
  flat = {k: np.squeeze(v) if gn_names & set(k) else v
          for k, v in flat.items()}
  return flax.traverse_util.unflatten_dict(flat)


def load(init_params, init_file, model_cfg, dont_load=()):
  del model_cfg
  restored = common.merge_params(u.load_params(init_file), init_params,
                                 dont_load)
  return fix_old_checkpoints(restored)
