"""InceptionV3 pool3 feature extractor (for FID), in flax.

Parity target: reference evaluators/proj/uvim/coltran_fid.py:30-80 embeds
the tensorflow_gan/tfhub Inception module to get 2048-d pool3 features.
Neither tf_gan nor tfhub exist in this image, so this is a native flax
InceptionV3 with module names matching the canonical torchvision /
pt_inception layout (Conv2d_1a_3x3, Mixed_5b/branch5x5_1, ...), plus a
converter from such a state dict (npz of name->array) into the flax tree.

Weights are NOT bundled (no egress from this environment): convert the
standard FID weights once with `convert_state_dict_npz` and point the
coltran_fid evaluator's `inception_ckpt` at the npz. Forward expects
[B, H, W, 3] in [-1, 1]; images are resized to 299x299 bilinearly
(matching the tfgan eval module), output is [B, 2048].
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv(nn.Module):
  """conv (no bias) + batchnorm (inference stats) + relu."""
  features: int
  kernel: tuple
  strides: tuple = (1, 1)
  padding: str = "VALID"

  @nn.compact
  def __call__(self, x):
    x = nn.Conv(self.features, self.kernel, self.strides, self.padding,
                use_bias=False, name="conv")(x)
    x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                     use_scale=True, use_bias=True, name="bn")(x)
    return nn.relu(x)


def _pool(x, window, strides, padding="VALID", kind="max"):
  fn = nn.max_pool if kind == "max" else nn.avg_pool
  return fn(x, (window, window), (strides, strides), padding)


class MixedA(nn.Module):  # Mixed_5b/5c/5d
  pool_features: int

  @nn.compact
  def __call__(self, x):
    b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
    b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
    b5 = BasicConv(64, (5, 5), padding="SAME", name="branch5x5_2")(b5)
    b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
    b3 = BasicConv(96, (3, 3), padding="SAME", name="branch3x3dbl_2")(b3)
    b3 = BasicConv(96, (3, 3), padding="SAME", name="branch3x3dbl_3")(b3)
    bp = _pool(x, 3, 1, "SAME", "avg")
    bp = BasicConv(self.pool_features, (1, 1), name="branch_pool")(bp)
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class ReductionA(nn.Module):  # Mixed_6a
  @nn.compact
  def __call__(self, x):
    b3 = BasicConv(384, (3, 3), (2, 2), name="branch3x3")(x)
    bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
    bd = BasicConv(96, (3, 3), padding="SAME", name="branch3x3dbl_2")(bd)
    bd = BasicConv(96, (3, 3), (2, 2), name="branch3x3dbl_3")(bd)
    bp = _pool(x, 3, 2)
    return jnp.concatenate([b3, bd, bp], axis=-1)


class MixedB(nn.Module):  # Mixed_6b..6e (factorized 7x7)
  c7: int

  @nn.compact
  def __call__(self, x):
    c7 = self.c7
    b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
    b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
    b7 = BasicConv(c7, (1, 7), padding="SAME", name="branch7x7_2")(b7)
    b7 = BasicConv(192, (7, 1), padding="SAME", name="branch7x7_3")(b7)
    bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
    bd = BasicConv(c7, (7, 1), padding="SAME", name="branch7x7dbl_2")(bd)
    bd = BasicConv(c7, (1, 7), padding="SAME", name="branch7x7dbl_3")(bd)
    bd = BasicConv(c7, (7, 1), padding="SAME", name="branch7x7dbl_4")(bd)
    bd = BasicConv(192, (1, 7), padding="SAME", name="branch7x7dbl_5")(bd)
    bp = _pool(x, 3, 1, "SAME", "avg")
    bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class ReductionB(nn.Module):  # Mixed_7a
  @nn.compact
  def __call__(self, x):
    b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
    b3 = BasicConv(320, (3, 3), (2, 2), name="branch3x3_2")(b3)
    b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
    b7 = BasicConv(192, (1, 7), padding="SAME", name="branch7x7x3_2")(b7)
    b7 = BasicConv(192, (7, 1), padding="SAME", name="branch7x7x3_3")(b7)
    b7 = BasicConv(192, (3, 3), (2, 2), name="branch7x7x3_4")(b7)
    bp = _pool(x, 3, 2)
    return jnp.concatenate([b3, b7, bp], axis=-1)


class MixedC(nn.Module):  # Mixed_7b/7c
  @nn.compact
  def __call__(self, x):
    b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
    b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
    b3a = BasicConv(384, (1, 3), padding="SAME", name="branch3x3_2a")(b3)
    b3b = BasicConv(384, (3, 1), padding="SAME", name="branch3x3_2b")(b3)
    b3 = jnp.concatenate([b3a, b3b], axis=-1)
    bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
    bd = BasicConv(384, (3, 3), padding="SAME", name="branch3x3dbl_2")(bd)
    bda = BasicConv(384, (1, 3), padding="SAME", name="branch3x3dbl_3a")(bd)
    bdb = BasicConv(384, (3, 1), padding="SAME", name="branch3x3dbl_3b")(bd)
    bd = jnp.concatenate([bda, bdb], axis=-1)
    bp = _pool(x, 3, 1, "SAME", "avg")
    bp = BasicConv(192, (1, 1), name="branch_pool")(bp)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
  """[B, H, W, 3] in [-1, 1] -> [B, 2048] pool3 features."""

  @nn.compact
  def __call__(self, x):
    if x.shape[1:3] != (299, 299):
      x = jax.image.resize(x, (x.shape[0], 299, 299, 3), "bilinear")
    x = BasicConv(32, (3, 3), (2, 2), name="Conv2d_1a_3x3")(x)
    x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
    x = BasicConv(64, (3, 3), padding="SAME", name="Conv2d_2b_3x3")(x)
    x = _pool(x, 3, 2)
    x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
    x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
    x = _pool(x, 3, 2)
    x = MixedA(32, name="Mixed_5b")(x)
    x = MixedA(64, name="Mixed_5c")(x)
    x = MixedA(64, name="Mixed_5d")(x)
    x = ReductionA(name="Mixed_6a")(x)
    x = MixedB(128, name="Mixed_6b")(x)
    x = MixedB(160, name="Mixed_6c")(x)
    x = MixedB(160, name="Mixed_6d")(x)
    x = MixedB(192, name="Mixed_6e")(x)
    x = ReductionB(name="Mixed_7a")(x)
    x = MixedC(name="Mixed_7b")(x)
    x = MixedC(name="Mixed_7c")(x)
    return jnp.mean(x, axis=(1, 2))  # global avg pool -> [B, 2048]


def convert_state_dict_npz(npz_path):
  """torchvision/pt_inception state-dict npz -> flax params tree.

  Expects keys like "Mixed_5b.branch1x1.conv.weight" (OIHW) and
  ".bn.{weight,bias,running_mean,running_var}". Produces the tree
  InceptionV3Features.init builds.
  """
  raw = dict(np.load(npz_path))
  params, batch_stats = {}, {}

  def put(tree, path, val):
    node = tree
    for k in path[:-1]:
      node = node.setdefault(k, {})
    node[path[-1]] = val

  for key, val in raw.items():
    parts = key.split(".")
    if parts[-2] == "conv" and parts[-1] == "weight":
      put(params, parts[:-1] + ["kernel"],
          np.transpose(val, (2, 3, 1, 0)))  # OIHW -> HWIO
    elif parts[-2] == "bn":
      name = {"weight": "scale", "bias": "bias"}.get(parts[-1])
      if name:
        put(params, parts[:-1] + [name], val)
      elif parts[-1] == "running_mean":
        put(batch_stats, parts[:-1] + ["mean"], val)
      elif parts[-1] == "running_var":
        put(batch_stats, parts[:-1] + ["var"], val)
  return {"params": params, "batch_stats": batch_stats}


def feature_fn_from_ckpt(ckpt_path):
  """Returns a jitted images->features fn from a converted npz."""
  variables = convert_state_dict_npz(ckpt_path)
  model = InceptionV3Features()

  @jax.jit
  def feats(images):
    return model.apply(variables, jnp.asarray(images, jnp.float32))
  return feats
