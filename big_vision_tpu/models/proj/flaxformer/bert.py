"""BERT encoder with a linear head on the CLS token.

Parity target: reference models/proj/flaxformer/bert.py, which wraps
flaxformer's BertEncoder (flaxformer is not in this image). This is a
native flax implementation of the same architecture — post-LN transformer
with learned word/position/segment embeddings (Devlin et al.,
arXiv:1810.04805) — exposing the same (config, num_classes,
head_zeroinit) Model interface and `load` for big_vision-style
checkpoints and for the public TF BERT release checkpoints
(`.../bert_model.ckpt`, Devlin et al. naming: `bert/encoder/layer_i/...`),
read via TF's checkpoint reader (reference: bert.py:69-99 +
bert_checkpoint_converter; hermetic fixture mirrors bert_test_util.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.models import common

CONFIGS = {
    # (width, depth, mlp_dim, num_heads); vocab/type sizes are BERT's.
    "base": dict(width=768, depth=12, mlp_dim=3072, num_heads=12),
    "large": dict(width=1024, depth=24, mlp_dim=4096, num_heads=16),
    # Tiny variant for hermetic tests of the TF-release loader.
    "test": dict(width=32, depth=2, mlp_dim=64, num_heads=2),
}
VOCAB_SIZE = 30_522
TYPE_VOCAB_SIZE = 2
MAX_POSITIONS = 512


LN_EPS = 1e-12  # BERT's LayerNorm epsilon (the TF release uses 1e-12).


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
    x = nn.LayerNorm(name="attention_norm", epsilon=LN_EPS)(x + y)
    y = nn.Dense(self.mlp_dim, name="mlp_in")(x)
    y = nn.gelu(y, approximate=False)
    y = nn.Dense(x.shape[-1], name="mlp_out")(y)
    y = nn.Dropout(self.dropout)(y, deterministic)
    return nn.LayerNorm(name="mlp_norm", epsilon=LN_EPS)(x + y)


class BertEncoder(nn.Module):
  """Embeddings + post-LN encoder stack."""
  width: int
  depth: int
  mlp_dim: int
  num_heads: int
  dropout: float = 0.1
  vocab_size: int = VOCAB_SIZE
  type_vocab_size: int = TYPE_VOCAB_SIZE
  max_positions: int = MAX_POSITIONS

  @nn.compact
  def __call__(self, token_ids, position_ids, segment_ids, input_mask,
               deterministic=True):
    emb_init = nn.initializers.normal(stddev=0.02)
    x = (nn.Embed(self.vocab_size, self.width, name="word_embeddings",
                  embedding_init=emb_init)(token_ids)
         + nn.Embed(self.max_positions, self.width,
                    name="position_embeddings",
                    embedding_init=emb_init)(position_ids)
         + nn.Embed(self.type_vocab_size, self.width, name="type_embeddings",
                    embedding_init=emb_init)(segment_ids))
    x = nn.LayerNorm(name="embeddings_norm", epsilon=LN_EPS)(x)
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
  vocab_size: int = VOCAB_SIZE
  type_vocab_size: int = TYPE_VOCAB_SIZE
  max_positions: int = MAX_POSITIONS

  @nn.compact
  def __call__(self, text, *, train=False):
    out = {}
    batch_size, max_len = text.shape
    encoder = BertEncoder(**CONFIGS[self.config], name="BertEncoder_0",
                          vocab_size=self.vocab_size,
                          type_vocab_size=self.type_vocab_size,
                          max_positions=self.max_positions)
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


def convert_tf_params(tf_params, *, num_heads, max_positions=None):
  """Public TF BERT release variables -> this module's flax param tree.

  `tf_params`: dict of numpy arrays keyed by the Devlin-et-al. names
  (`bert/embeddings/word_embeddings`, `bert/encoder/layer_i/...`).
  Q/K/V kernels are reshaped [W, W] -> [W, H, Dh] (and the attention
  output kernel [W, W] -> [H, Dh, W]) to match flax's
  MultiHeadDotProductAttention layout. Pooler/cls heads are dropped,
  same as the reference (bert.py:84).
  """
  g = lambda name: np.asarray(tf_params[name])
  width = g("bert/embeddings/word_embeddings").shape[-1]
  head_dim = width // num_heads

  def qkv_kernel(name):
    return g(name).reshape(width, num_heads, head_dim)

  def qkv_bias(name):
    return g(name).reshape(num_heads, head_dim)

  pos = g("bert/embeddings/position_embeddings")
  if max_positions is not None:
    pos = pos[:max_positions]  # model may use a shorter context (ref :86-88)

  out = {
      "word_embeddings": {"embedding": g("bert/embeddings/word_embeddings")},
      "position_embeddings": {"embedding": pos},
      "type_embeddings": {
          "embedding": g("bert/embeddings/token_type_embeddings")},
      "embeddings_norm": {"scale": g("bert/embeddings/LayerNorm/gamma"),
                          "bias": g("bert/embeddings/LayerNorm/beta")},
  }
  i = 0
  while f"bert/encoder/layer_{i}/attention/self/query/kernel" in tf_params:
    p = f"bert/encoder/layer_{i}"
    out[f"layer_{i}"] = {
        "attention": {
            "query": {"kernel": qkv_kernel(f"{p}/attention/self/query/kernel"),
                      "bias": qkv_bias(f"{p}/attention/self/query/bias")},
            "key": {"kernel": qkv_kernel(f"{p}/attention/self/key/kernel"),
                    "bias": qkv_bias(f"{p}/attention/self/key/bias")},
            "value": {"kernel": qkv_kernel(f"{p}/attention/self/value/kernel"),
                      "bias": qkv_bias(f"{p}/attention/self/value/bias")},
            "out": {"kernel": g(f"{p}/attention/output/dense/kernel").reshape(
                num_heads, head_dim, width),
                    "bias": g(f"{p}/attention/output/dense/bias")},
        },
        "attention_norm": {
            "scale": g(f"{p}/attention/output/LayerNorm/gamma"),
            "bias": g(f"{p}/attention/output/LayerNorm/beta")},
        "mlp_in": {"kernel": g(f"{p}/intermediate/dense/kernel"),
                   "bias": g(f"{p}/intermediate/dense/bias")},
        "mlp_out": {"kernel": g(f"{p}/output/dense/kernel"),
                    "bias": g(f"{p}/output/dense/bias")},
        "mlp_norm": {"scale": g(f"{p}/output/LayerNorm/gamma"),
                     "bias": g(f"{p}/output/LayerNorm/beta")},
    }
    i += 1
  assert i, "no bert/encoder/layer_* variables found in checkpoint"
  return out


def load_tf_checkpoint(ckpt_path, *, num_heads, max_positions=None):
  """Reads a TF BERT release checkpoint into the flax param tree.

  Uses TF's checkpoint reader when tensorflow is importable; raises a
  clear error otherwise (the TF bundle format needs its reader).
  """
  try:
    from tensorflow.python.training import py_checkpoint_reader
    reader = py_checkpoint_reader.NewCheckpointReader(ckpt_path)
  except ImportError as e:
    raise NotImplementedError(
        "Loading original TF BERT release checkpoints requires tensorflow "
        "(its checkpoint-bundle reader); convert to npz first.") from e
  tf_params = {
      name: reader.get_tensor(name)
      for name in reader.get_variable_to_dtype_map()
      if name.startswith("bert/")
  }
  return convert_tf_params(tf_params, num_heads=num_heads,
                           max_positions=max_positions)


def load(params, path, model_cfg=None, dont_load=()):
  """Merges a checkpoint: big_vision-style npz/ts, or the public TF release
  (a directory holding `bert_model.ckpt.*`, or a direct `...ckpt` prefix)."""
  import os
  ckpt = path if path.endswith(".ckpt") else os.path.join(
      path, "bert_model.ckpt")
  if os.path.exists(f"{ckpt}.index"):
    enc = params["BertEncoder_0"]
    num_heads = enc["layer_0"]["attention"]["query"]["kernel"].shape[1] \
        if "layer_0" in enc else CONFIGS[
            (model_cfg or {}).get("config", "base")]["num_heads"]
    max_positions = enc["position_embeddings"]["embedding"].shape[0]
    restored = {"BertEncoder_0": load_tf_checkpoint(
        ckpt, num_heads=num_heads, max_positions=max_positions)}
    return common.merge_params(restored, params, dont_load)
  restored = u.load_params(path)
  return common.merge_params(restored, params, dont_load)
