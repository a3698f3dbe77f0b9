"""BERT encoder with a linear head on the CLS token.

Parity target: reference models/proj/flaxformer/bert.py, which wraps
flaxformer's BertEncoder (flaxformer is not in this image). This is a
native flax implementation of the same architecture — post-LN transformer
with learned word/position/segment embeddings (Devlin et al.,
arXiv:1810.04805) — exposing the same (config, num_classes,
head_zeroinit) Model interface and `load` for big_vision-style
checkpoints. Loading the original TF BERT release checkpoints requires
the TF toolchain and is gated with a clear error.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

import big_vision_tpu.utils as u
from big_vision_tpu.models import common

CONFIGS = {
    # (width, depth, mlp_dim, num_heads); vocab/type sizes are BERT's.
    "base": dict(width=768, depth=12, mlp_dim=3072, num_heads=12),
    "large": dict(width=1024, depth=24, mlp_dim=4096, num_heads=16),
}
VOCAB_SIZE = 30_522
TYPE_VOCAB_SIZE = 2
MAX_POSITIONS = 512


class BertLayer(nn.Module):
  """Post-LN transformer block (attention -> LN -> MLP -> LN)."""
  mlp_dim: int
  num_heads: int
  dropout: float = 0.1

  @nn.compact
  def __call__(self, x, mask, deterministic=True):
    y = nn.MultiHeadDotProductAttention(
        num_heads=self.num_heads, name="attention")(
            x, x, mask=mask, deterministic=deterministic)
    y = nn.Dropout(self.dropout)(y, deterministic)
    x = nn.LayerNorm(name="attention_norm")(x + y)
    y = nn.Dense(self.mlp_dim, name="mlp_in")(x)
    y = nn.gelu(y, approximate=False)
    y = nn.Dense(x.shape[-1], name="mlp_out")(y)
    y = nn.Dropout(self.dropout)(y, deterministic)
    return nn.LayerNorm(name="mlp_norm")(x + y)


class BertEncoder(nn.Module):
  """Embeddings + post-LN encoder stack."""
  width: int
  depth: int
  mlp_dim: int
  num_heads: int
  dropout: float = 0.1

  @nn.compact
  def __call__(self, token_ids, position_ids, segment_ids, input_mask,
               deterministic=True):
    emb_init = nn.initializers.normal(stddev=0.02)
    x = (nn.Embed(VOCAB_SIZE, self.width, name="word_embeddings",
                  embedding_init=emb_init)(token_ids)
         + nn.Embed(MAX_POSITIONS, self.width, name="position_embeddings",
                    embedding_init=emb_init)(position_ids)
         + nn.Embed(TYPE_VOCAB_SIZE, self.width, name="type_embeddings",
                    embedding_init=emb_init)(segment_ids))
    x = nn.LayerNorm(name="embeddings_norm")(x)
    x = nn.Dropout(self.dropout)(x, deterministic)

    attn_mask = nn.attention.make_attention_mask(
        jnp.ones_like(input_mask), input_mask.astype(bool))
    for i in range(self.depth):
      x = BertLayer(mlp_dim=self.mlp_dim, num_heads=self.num_heads,
                    dropout=self.dropout, name=f"layer_{i}")(
                        x, attn_mask, deterministic)
    return x


class Model(nn.Module):
  """BERT encoder with linear projection on the last-layer CLS token."""

  config: str
  num_classes: Optional[int] = None
  head_zeroinit: bool = True

  @nn.compact
  def __call__(self, text, *, train=False):
    out = {}
    batch_size, max_len = text.shape
    encoder = BertEncoder(**CONFIGS[self.config], name="BertEncoder_0")
    x = out["transformed"] = encoder(
        token_ids=text,
        position_ids=jnp.tile(jnp.arange(max_len, dtype=jnp.int32),
                              [batch_size, 1]),
        segment_ids=jnp.zeros([batch_size, max_len], jnp.int32),
        input_mask=(text != 0).astype(jnp.int32),
        deterministic=not train)

    x = out["pre_logits"] = x[:, 0]  # CLS token.

    if self.num_classes:
      kw = {"kernel_init": nn.initializers.zeros} if self.head_zeroinit \
          else {}
      x = out["logits"] = nn.Dense(self.num_classes, name="head", **kw)(x)
    return x, out


def load(params, path, model_cfg=None, dont_load=()):
  """Merges a big_vision-style checkpoint; TF-release ckpts are gated."""
  del model_cfg
  if path.endswith(".ckpt") or "/bert_model.ckpt" in path:
    raise NotImplementedError(
        "Loading original TF BERT release checkpoints needs the TF "
        "checkpoint reader, which is not part of this framework; convert "
        "to npz first (tools) or use a big_vision-format checkpoint.")
  restored = u.load_params(path)
  return common.merge_params(restored, params, dont_load)
