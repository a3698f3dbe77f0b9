"""Hermetic test of the public TF BERT release checkpoint loader.

Mirrors the reference's bert_test_util.py strategy (a tiny fake TF
checkpoint built on the fly) but goes further: weights are RANDOM and the
loaded flax model's forward pass is compared against HuggingFace's
BertModel carrying the same weights, so both the name/shape mapping and
the architecture semantics (post-LN, exact-gelu, embedding sum) are
verified, not just that loading doesn't crash.
"""

import numpy as np
import pytest

# Multi-minute on the 1-CPU CI host (jit compiles dominate): heavy tier.
pytestmark = pytest.mark.heavy


tf = pytest.importorskip("tensorflow")

WIDTH, DEPTH, HEADS, MLP = 32, 2, 2, 64
VOCAB, TYPES, POSITIONS = 64, 2, 16


def _tiny_tf_variables(rs):
  """Random values under the public BERT release variable names."""
  v = {
      "bert/embeddings/word_embeddings": rs.randn(VOCAB, WIDTH),
      "bert/embeddings/position_embeddings": rs.randn(POSITIONS, WIDTH),
      "bert/embeddings/token_type_embeddings": rs.randn(TYPES, WIDTH),
      "bert/embeddings/LayerNorm/gamma": 1 + 0.1 * rs.randn(WIDTH),
      "bert/embeddings/LayerNorm/beta": 0.1 * rs.randn(WIDTH),
      # Pooler/cls vars exist in real ckpts; the loader must ignore them.
      "bert/pooler/dense/kernel": rs.randn(WIDTH, WIDTH),
      "bert/pooler/dense/bias": rs.randn(WIDTH),
      "cls/seq_relationship/output_bias": rs.randn(2),
  }
  for i in range(DEPTH):
    p = f"bert/encoder/layer_{i}"
    for qkv in ("query", "key", "value"):
      v[f"{p}/attention/self/{qkv}/kernel"] = rs.randn(WIDTH, WIDTH)
      v[f"{p}/attention/self/{qkv}/bias"] = rs.randn(WIDTH)
    v[f"{p}/attention/output/dense/kernel"] = rs.randn(WIDTH, WIDTH)
    v[f"{p}/attention/output/dense/bias"] = rs.randn(WIDTH)
    v[f"{p}/attention/output/LayerNorm/gamma"] = 1 + 0.1 * rs.randn(WIDTH)
    v[f"{p}/attention/output/LayerNorm/beta"] = 0.1 * rs.randn(WIDTH)
    v[f"{p}/intermediate/dense/kernel"] = rs.randn(WIDTH, MLP)
    v[f"{p}/intermediate/dense/bias"] = rs.randn(MLP)
    v[f"{p}/output/dense/kernel"] = rs.randn(MLP, WIDTH)
    v[f"{p}/output/dense/bias"] = rs.randn(WIDTH)
    v[f"{p}/output/LayerNorm/gamma"] = 1 + 0.1 * rs.randn(WIDTH)
    v[f"{p}/output/LayerNorm/beta"] = 0.1 * rs.randn(WIDTH)
  return {k: (x * 0.05 if "LayerNorm" not in k else x).astype(np.float32)
          for k, x in v.items()}


def _write_tf_ckpt(variables, prefix):
  """Writes variables to a v1-style checkpoint at `prefix` (exact names)."""
  g = tf.Graph()
  with g.as_default():
    tfvars = [tf.compat.v1.Variable(val, name=name)
              for name, val in variables.items()]
    saver = tf.compat.v1.train.Saver(var_list=tfvars)
    with tf.compat.v1.Session() as sess:
      sess.run(tf.compat.v1.global_variables_initializer())
      saver.save(sess, prefix, write_meta_graph=False)


def _hf_oracle(variables, token_ids):
  """Same weights in HuggingFace BertModel -> last_hidden_state."""
  torch = pytest.importorskip("torch")
  transformers = pytest.importorskip("transformers")
  cfg = transformers.BertConfig(
      vocab_size=VOCAB, hidden_size=WIDTH, num_hidden_layers=DEPTH,
      num_attention_heads=HEADS, intermediate_size=MLP,
      max_position_embeddings=POSITIONS, type_vocab_size=TYPES,
      hidden_act="gelu", hidden_dropout_prob=0.0,
      attention_probs_dropout_prob=0.0, layer_norm_eps=1e-12)
  model = transformers.BertModel(cfg, add_pooling_layer=False)
  t = lambda name: torch.from_numpy(variables[name])
  sd = {
      "embeddings.word_embeddings.weight":
          t("bert/embeddings/word_embeddings"),
      "embeddings.position_embeddings.weight":
          t("bert/embeddings/position_embeddings"),
      "embeddings.token_type_embeddings.weight":
          t("bert/embeddings/token_type_embeddings"),
      "embeddings.LayerNorm.weight": t("bert/embeddings/LayerNorm/gamma"),
      "embeddings.LayerNorm.bias": t("bert/embeddings/LayerNorm/beta"),
  }
  for i in range(DEPTH):
    p = f"bert/encoder/layer_{i}"
    h = f"encoder.layer.{i}"
    for qkv in ("query", "key", "value"):
      sd[f"{h}.attention.self.{qkv}.weight"] = t(
          f"{p}/attention/self/{qkv}/kernel").T.contiguous()
      sd[f"{h}.attention.self.{qkv}.bias"] = t(
          f"{p}/attention/self/{qkv}/bias")
    sd[f"{h}.attention.output.dense.weight"] = t(
        f"{p}/attention/output/dense/kernel").T.contiguous()
    sd[f"{h}.attention.output.dense.bias"] = t(
        f"{p}/attention/output/dense/bias")
    sd[f"{h}.attention.output.LayerNorm.weight"] = t(
        f"{p}/attention/output/LayerNorm/gamma")
    sd[f"{h}.attention.output.LayerNorm.bias"] = t(
        f"{p}/attention/output/LayerNorm/beta")
    sd[f"{h}.intermediate.dense.weight"] = t(
        f"{p}/intermediate/dense/kernel").T.contiguous()
    sd[f"{h}.intermediate.dense.bias"] = t(f"{p}/intermediate/dense/bias")
    sd[f"{h}.output.dense.weight"] = t(
        f"{p}/output/dense/kernel").T.contiguous()
    sd[f"{h}.output.dense.bias"] = t(f"{p}/output/dense/bias")
    sd[f"{h}.output.LayerNorm.weight"] = t(f"{p}/output/LayerNorm/gamma")
    sd[f"{h}.output.LayerNorm.bias"] = t(f"{p}/output/LayerNorm/beta")
  missing, unexpected = model.load_state_dict(sd, strict=False)
  assert not unexpected, unexpected
  assert all("position_ids" in m for m in missing), missing
  model.eval()
  with torch.no_grad():
    out = model(input_ids=torch.from_numpy(token_ids),
                attention_mask=torch.ones_like(torch.from_numpy(token_ids)))
  return out.last_hidden_state.numpy()


def test_tf_release_loader_matches_hf(tmp_path):
  import jax
  import jax.numpy as jnp

  from big_vision_tpu.models.proj.flaxformer import bert

  rs = np.random.RandomState(0)
  variables = _tiny_tf_variables(rs)
  _write_tf_ckpt(variables, str(tmp_path / "bert_model.ckpt"))

  model = bert.Model(config="test", vocab_size=VOCAB, type_vocab_size=TYPES,
                     max_positions=POSITIONS)
  # Tokens all nonzero so there is no padding (HF masks pads differently).
  token_ids = rs.randint(1, VOCAB, size=(2, POSITIONS)).astype(np.int32)
  params = model.init(jax.random.PRNGKey(0), jnp.asarray(token_ids))["params"]
  params = jax.device_get(params)

  loaded = bert.load(params, str(tmp_path))
  # Every encoder leaf must have been overwritten by the checkpoint.
  assert not np.allclose(
      loaded["BertEncoder_0"]["layer_0"]["mlp_in"]["kernel"],
      params["BertEncoder_0"]["layer_0"]["mlp_in"]["kernel"])

  _, out = model.apply({"params": loaded}, jnp.asarray(token_ids))
  want = _hf_oracle(variables, token_ids)
  np.testing.assert_allclose(np.asarray(out["transformed"]), want,
                             atol=2e-5, rtol=1e-4)


def test_tf_loader_slices_long_position_embeddings(tmp_path):
  """Model with a shorter context loads a ckpt with longer pos-emb."""
  import jax
  import jax.numpy as jnp

  from big_vision_tpu.models.proj.flaxformer import bert

  rs = np.random.RandomState(1)
  variables = _tiny_tf_variables(rs)
  _write_tf_ckpt(variables, str(tmp_path / "bert_model.ckpt"))

  short = POSITIONS // 2
  model = bert.Model(config="test", vocab_size=VOCAB, type_vocab_size=TYPES,
                     max_positions=short)
  toks = jnp.ones((1, short), jnp.int32)
  params = jax.device_get(model.init(jax.random.PRNGKey(0), toks)["params"])
  loaded = bert.load(params, str(tmp_path))
  got = loaded["BertEncoder_0"]["position_embeddings"]["embedding"]
  np.testing.assert_allclose(
      got, variables["bert/embeddings/position_embeddings"][:short])
