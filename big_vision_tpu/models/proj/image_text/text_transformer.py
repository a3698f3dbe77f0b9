"""CLIP-style text tower on top of the shared ViT encoder stack.

Behavior parity: reference models/proj/image_text/text_transformer.py:29-119
(learned posemb added to token embeddings, vit.Encoder body, tied
vocab logits via Embed.attend, pooling last/first/gap/gmp/map, optional
dense head). Param tree matches the reference so LiT/SigLIP text-tower
checkpoints load unmodified. Default pooling is "last", which relies on
the sticky-EOS tokenization contract (pp ops_text eos="sticky").
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.models import common, vit

# Sequence-level readouts that need no parameters. "map" (parametric
# attention pooling) is handled separately in __call__.
_READOUTS = {
    "last": lambda t: t[:, -1, :],
    "first": lambda t: t[:, 0, :],
    "gap": lambda t: t.mean(axis=1),
    "mean": lambda t: t.mean(axis=1),
    "gmp": lambda t: t.max(axis=1),
    "max": lambda t: t.max(axis=1),
}


class _Model(nn.Module):
  """Text transformer; width-scaled with the paired image tower."""

  num_classes: int
  # Tower geometry (width-scaled together with the image tower).
  width: int = 512
  depth: int = 12
  num_heads: int = 8
  mlp_dim: int = 2048
  vocab_size: int = 32_000
  pool_type: str = "last"
  # Regularization & compilation knobs.
  dropout: float = 0.0
  scan: bool = False
  remat_policy: str = "nothing_saveable"
  dtype_mm: str = "float32"

  @nn.compact
  def __call__(self, text, *, train=False):
    tap = {}
    vocab = nn.Embed(features=self.width,
                     num_embeddings=self.vocab_size)
    tokens = tap["embedded"] = vocab(text)

    seqlen, dim = tokens.shape[-2:]
    posemb = self.param("pos_embedding",
                        nn.initializers.normal(stddev=dim ** -0.5),
                        (1, seqlen, dim), tokens.dtype)

    body = vit.Encoder(
        num_heads=self.num_heads, depth=self.depth,
        dtype_mm=self.dtype_mm, dropout=self.dropout,
        remat_policy=self.remat_policy, scan=self.scan,
        mlp_dim=self.mlp_dim)
    encoded, body_tap = body(tokens + posemb, deterministic=not train)
    tap["transformed"] = encoded
    tap.update(body_tap)

    # The input embedding doubles as the output projection (tied weights),
    # so per-position token logits come for free.
    tap["vocab_logits"] = vocab.attend(encoded)

    if self.pool_type == "map":
      rep = vit.MAPHead(dtype_mm=self.dtype_mm, mlp_dim=self.mlp_dim,
                        num_heads=self.num_heads)(encoded)
    elif self.pool_type in _READOUTS:
      rep = _READOUTS[self.pool_type](encoded)
    else:
      raise NotImplementedError(f"Unknown pool_type {self.pool_type!r}")
    tap["pre_logits"] = rep

    if self.num_classes:
      head = nn.Dense(name="head", features=self.num_classes)
      rep = tap["logits"] = head(rep)
    return rep, tap


def Model(num_classes, *, variant=None, **kw):  # pylint: disable=invalid-name
  kw = {**vit.decode_variant(variant), **kw}
  return _Model(num_classes, **kw)


def load(init_params, init_file, model_cfg, dont_load=()):
  del model_cfg
  import flax
  import flax.training.checkpoints
  params = flax.core.unfreeze(
      flax.training.checkpoints.convert_pre_linen(u.load_params(init_file)))
  # A few historical (and expensive) checkpoints accidentally stored the
  # posemb both at the top level and inside the encoder; fold them.
  stray = params.get("Encoder_0", {}).pop("pos_embedding", None)
  if stray is not None:
    params["pos_embedding"] = params["pos_embedding"] + stray
  return common.merge_params(params, init_params, dont_load)
