"""BiT ResNet-V2 (pre-activation) as in the Big Transfer paper.

Behavior parity with reference models/bit_paper.py: mean-of-squares
GroupNorm with (1,1,1,C) params (matches the TF BiT release numerics, which
matters when loading the public BiT-M/S weights), pre-act bottlenecks with
explicit paddings, per-unit feature taps, and the gs://bit_models importer
including the legacy TF layout converter. Compute primitives come from
models/convnets.py (msq flavors of WSConv / GroupNorm).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Union

import flax.linen as nn
import jax.numpy as jnp

import big_vision_tpu.utils as u
from big_vision_tpu.models import bit, common
from big_vision_tpu.models import convnets as cn

# The paper flavor: RMS-standardized convs (eps inside the sqrt) and
# mean-of-squares GroupNorm with broadcastable (1,1,1,C) params.
_CONV = dict(ws="rms", eps=1e-10, use_bias=False)
_GN = dict(msq=True, eps=1e-5)

def load(init_params, init_file, model_cfg, dont_load=()):
  """Loads BiT-{L,M,S} paper checkpoints or npz files."""
  vanity = {
      "FunMatch-224px-i1k82.8": "gs://bit_models/distill/R50x1_224.npz",
      "FunMatch-160px-i1k80.5": "gs://bit_models/distill/R50x1_160.npz",
  }
  if init_file and init_file[0] in ("L", "M", "S"):
    upstream, downstream = ((init_file.split("-", 1) + [""])[:2]
                            if "-" in init_file else (init_file, ""))
    if downstream:
      downstream = "-" + {"imagenet2012": "ILSVRC2012"}.get(downstream,
                                                            downstream)
    cfg = dict(model_cfg)
    fname = (f"gs://bit_models/BiT-{upstream}-"
             f"R{cfg['depth']}x{cfg['width']}{downstream}.npz")
  else:
    fname = vanity.get(init_file, init_file)

  params = maybe_convert_big_transfer_format(u.load_params(fname))
  return common.merge_params(params, init_params, dont_load)

def maybe_convert_big_transfer_format(params_tf):
  """Converts the original TF BiT release layout to this module's tree."""
  if "resnet" not in params_tf:
    return params_tf

  flat = dict(u.tree_flatten_with_names(params_tf)[0])
  # The TF export numbers repeated conv layers; collapse the suffix.
  flat = {re.sub(r"/standardized_conv2d_\d+/", "/standardized_conv2d/", k): v
          for k, v in flat.items()}

  def gn_of(prefix):
    return {"bias": flat[f"{prefix}/beta"][None, None, None],
            "scale": flat[f"{prefix}/gamma"][None, None, None]}

  params = {
      "root_block": {"conv_root": {
          "kernel": flat["resnet/root_block/standardized_conv2d/kernel"]}},
      "norm-pre-head": gn_of("resnet/group_norm"),
      "head": {"kernel": flat["resnet/head/conv2d/kernel"][0, 0],
               "bias": flat["resnet/head/conv2d/bias"]},
  }
  for block in ("block1", "block2", "block3", "block4"):
    units = {m.group(0) for k in flat if block in k
             for m in [re.search(r"unit\d+", k)] if m}
    params[block] = {}
    for unit in sorted(units):
      tf_base = f"resnet/{block}/{unit}"
      tree = {}
      for i, branch in enumerate("abc", 1):
        tree[f"conv{i}"] = {"kernel": flat[
            f"{tf_base}/{branch}/standardized_conv2d/kernel"]}
        tree[f"gn{i}"] = gn_of(f"{tf_base}/{branch}/group_norm")
      projs = [k for k in flat if f"{block}/{unit}/a/proj" in k]
      assert len(projs) <= 1, projs
      if projs:
        tree["conv_proj"] = {"kernel": flat[projs[0]]}
      params[block][unit] = tree
  return params

class RootBlock(nn.Module):
  width: int

  @nn.compact
  def __call__(self, x):
    x = cn.WSConv(self.width, 7, 2, padding=[(3, 3), (3, 3)], **_CONV,
                  name="conv_root")(x)
    return nn.max_pool(x, (3, 3), strides=(2, 2),
                       padding=[(1, 1), (1, 1)])

class ResidualUnit(nn.Module):
  """Pre-activation bottleneck: GN+relu precede each conv."""
  nmid: Optional[int] = None
  strides: Sequence[int] = (1, 1)

  @nn.compact
  def __call__(self, x):
    mid = self.nmid or x.shape[-1] // 4
    wide = 4 * mid
    stride = tuple(self.strides)
    preact = lambda i, t: nn.relu(cn.GroupNorm(**_GN, name=f"gn{i}")(t))

    y = preact(1, x)
    # Projection sees the *normalized* input — a pre-act detail that
    # differs from the V1 flavor in models/bit.py.
    needs_proj = stride != (1, 1) or x.shape[-1] != wide
    shortcut = (cn.WSConv(wide, 1, stride, **_CONV, name="conv_proj")(y)
                if needs_proj else x)

    y = cn.WSConv(mid, 1, **_CONV, name="conv1")(y)
    y = cn.WSConv(mid, 3, stride, padding=[(1, 1), (1, 1)], **_CONV,
                  name="conv2")(preact(2, y))
    y = cn.WSConv(wide, 1, **_CONV, name="conv3")(preact(3, y))
    return y + shortcut

class ResNetStage(nn.Module):
  block_size: int
  nmid: Optional[int] = None
  first_stride: Sequence[int] = (1, 1)

  @nn.compact
  def __call__(self, x):
    taps = {}
    for i in range(self.block_size):
      stride = self.first_stride if i == 0 else (1, 1)
      name = f"unit{i + 1:02d}"
      x = taps[name] = ResidualUnit(self.nmid, strides=stride,
                                    name=name)(x)
    return x, taps

class Model(nn.Module):
  """ResNetV2 with GN+WS (BiT paper flavor)."""
  num_classes: Optional[int] = None
  depth: Union[int, Sequence[int]] = 50
  width: int = 1
  head_zeroinit: bool = True

  @nn.compact
  def __call__(self, image, *, train=False):
    del train
    plan = bit.get_block_desc(self.depth)
    base = int(64 * self.width)
    taps = {}

    x = taps["stem"] = RootBlock(width=base, name="root_block")(image)
    for i, nblocks in enumerate(plan):
      x, taps[f"stage{i + 1}"] = ResNetStage(
          nblocks, base * 2 ** i,
          first_stride=(1, 1) if i == 0 else (2, 2),
          name=f"block{i + 1}")(x)

    x = taps["norm_pre_head"] = cn.GroupNorm(**_GN, name="norm-pre-head")(x)
    x = taps["pre_logits_2d"] = nn.relu(x)
    x = taps["pre_logits"] = jnp.mean(x, axis=(1, 2))

    if not self.num_classes:
      return x, taps
    kw = {"kernel_init": nn.initializers.zeros} if self.head_zeroinit else {}
    head = nn.Dense(self.num_classes, name="head", **kw)
    taps["logits_2d"] = head(taps["pre_logits_2d"])
    x = taps["logits"] = head(x)
    return x, taps
