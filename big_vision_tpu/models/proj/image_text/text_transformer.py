"""CLIP-style text transformer tower.

Parity target: reference models/proj/image_text/text_transformer.py:29-119
(reuses the ViT Encoder; learned posemb; pooling last/first/gap/gmp/map;
tied vocab logits). Param names match for checkpoint compat.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.models import common, vit


class _Model(nn.Module):
  """Text transformer; repr taken per `pool_type` (default: last=EOS with
  sticky-EOS tokenization)."""

  num_classes: int
  width: int = 512
  depth: int = 12
  mlp_dim: int = 2048
  num_heads: int = 8
  dropout: float = 0.0
  vocab_size: int = 32_000
  pool_type: str = "last"
  scan: bool = False
  remat_policy: str = "nothing_saveable"
  dtype_mm: str = "float32"

  @nn.compact
  def __call__(self, text, *, train=False):
    out = {}
    embedding = nn.Embed(num_embeddings=self.vocab_size, features=self.width)
    x = out["embedded"] = embedding(text)

    _, l, d = x.shape
    x = x + self.param("pos_embedding",
                       nn.initializers.normal(stddev=1 / np.sqrt(d)),
                       (1, l, d), x.dtype)

    x, encoder_out = vit.Encoder(
        depth=self.depth, mlp_dim=self.mlp_dim, num_heads=self.num_heads,
        scan=self.scan, remat_policy=self.remat_policy,
        dropout=self.dropout, dtype_mm=self.dtype_mm)(
            x, deterministic=not train)
    out.update({"transformed": x, **encoder_out})

    # Tied in/out embedding gives token logits for free.
    out["vocab_logits"] = embedding.attend(x)

    if self.pool_type == "last":
      x = out["pre_logits"] = x[:, -1, :]
    elif self.pool_type == "first":
      x = out["pre_logits"] = x[:, 0, :]
    elif self.pool_type in ("mean", "gap"):
      x = out["pre_logits"] = x.mean(axis=1)
    elif self.pool_type in ("max", "gmp"):
      x = out["pre_logits"] = x.max(axis=1)
    elif self.pool_type == "map":
      x = out["pre_logits"] = vit.MAPHead(
          num_heads=self.num_heads, mlp_dim=self.mlp_dim,
          dtype_mm=self.dtype_mm)(x)
    else:
      raise NotImplementedError(f"Unknown pool_type {self.pool_type!r}")

    if self.num_classes:
      x = out["logits"] = nn.Dense(self.num_classes, name="head")(x)
    return x, out


def Model(num_classes, *, variant=None, **kw):  # pylint: disable=invalid-name
  return _Model(num_classes, **{**vit.decode_variant(variant), **kw})


def load(init_params, init_file, model_cfg, dont_load=()):
  del model_cfg
  import flax
  import flax.training.checkpoints
  params = u.load_params(init_file)
  params = flax.core.unfreeze(
      flax.training.checkpoints.convert_pre_linen(params))
  # Some historical checkpoints added the posemb twice; fold them together.
  if "Encoder_0" in params:
    extra = params["Encoder_0"].pop("pos_embedding", 0)
    params["pos_embedding"] = params["pos_embedding"] + extra
  return common.merge_params(params, init_params, dont_load)
