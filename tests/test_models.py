import jax
import jax.numpy as jnp
import numpy as np
import pytest

import big_vision_tpu.utils as u
from big_vision_tpu.models import bit, common, mlp_mixer, vit


def init_vit(rng=0, img=(2, 32, 32, 3), **kw):
  model = vit.Model(**kw)
  x = jnp.zeros(img)
  params = model.init(jax.random.PRNGKey(rng), x)["params"]
  return model, params, x


def test_vit_forward_shapes():
  model, params, x = init_vit(num_classes=10, variant="mu/16")
  logits, out = model.apply({"params": params}, x)
  assert logits.shape == (2, 10)
  assert out["encoded"].shape == (2, 4, 32)
  assert out["pre_logits"].shape == (2, 32)


@pytest.mark.parametrize("pool", ["gap", "tok", "0", "map"])
def test_vit_pool_types(pool):
  model, params, x = init_vit(num_classes=5, variant="mu/16", pool_type=pool)
  logits, _ = model.apply({"params": params}, x)
  assert logits.shape == (2, 5)


def test_vit_param_names_match_reference_layout():
  """Published big_vision .npz checkpoints must map 1:1 onto our tree."""
  _, params, _ = init_vit(num_classes=10, variant="mu/16", pool_type="map",
                          rep_size=True)
  names = {n for n, _ in u.tree_flatten_with_names(params)[0]}
  expect_sub = {
      "embedding/kernel", "embedding/bias", "pos_embedding",
      "Transformer/encoderblock_0/LayerNorm_0/scale",
      "Transformer/encoderblock_0/MultiHeadDotProductAttention_0/query/kernel",
      "Transformer/encoderblock_0/MultiHeadDotProductAttention_0/out/kernel",
      "Transformer/encoderblock_0/MlpBlock_0/Dense_0/kernel",
      "Transformer/encoderblock_0/MlpBlock_0/Dense_1/bias",
      "Transformer/encoder_norm/scale",
      "MAPHead_0/probe",
      "MAPHead_0/MultiHeadDotProductAttention_0/query/kernel",
      "MAPHead_0/MlpBlock_0/Dense_0/kernel",
      "MAPHead_0/LayerNorm_0/scale",
      "pre_logits/kernel", "head/kernel", "head/bias",
  }
  missing = expect_sub - names
  assert not missing, f"Missing reference param names: {sorted(missing)}"
  # Attention kernel shapes match flax MHDPA convention (d, H, hd).
  q = u.tree_get(
      params, "Transformer/encoderblock_0/MultiHeadDotProductAttention_0/query/kernel")
  assert q.shape == (32, 2, 16)
  o = u.tree_get(
      params, "Transformer/encoderblock_0/MultiHeadDotProductAttention_0/out/kernel")
  assert o.shape == (2, 16, 32)


def test_vit_sincos_posemb_has_no_param():
  _, params, _ = init_vit(num_classes=3, variant="mu/16", posemb="sincos2d")
  names = {n for n, _ in u.tree_flatten_with_names(params)[0]}
  assert "pos_embedding" not in names


def test_vit_scan_matches_pyloop():
  """Same seed -> convert pyloop params to scan layout -> same output."""
  model_loop, params_loop, x = init_vit(num_classes=4, variant="mu/16")
  model_scan = vit.Model(num_classes=4, variant="mu/16", scan=True)
  params_scan = vit.pyloop_to_scan(params_loop)
  y_loop, _ = model_loop.apply({"params": params_loop}, x)
  y_scan, _ = model_scan.apply({"params": params_scan}, x)
  np.testing.assert_allclose(y_loop, y_scan, atol=1e-5)
  # Round-trip back.
  back = vit.scan_to_pyloop(params_scan)
  y_back, _ = model_loop.apply({"params": back}, x)
  np.testing.assert_allclose(y_loop, y_back, atol=1e-6)


def test_vit_attention_matches_flax():
  """Our MHA core must agree numerically with flax's reference module."""
  import flax.linen as nn
  d, heads = 32, 4
  x = jnp.asarray(np.random.RandomState(0).randn(2, 7, d), jnp.float32)
  ours = vit.MultiHeadAttention(num_heads=heads)
  theirs = nn.MultiHeadDotProductAttention(
      num_heads=heads, kernel_init=nn.initializers.xavier_uniform(),
      deterministic=True)
  p = theirs.init(jax.random.PRNGKey(0), x, x)["params"]
  y_theirs = theirs.apply({"params": p}, x, x)
  y_ours = ours.apply({"params": p}, x, x)  # same param tree!
  np.testing.assert_allclose(y_ours, y_theirs, atol=2e-5)


def test_resample_posemb():
  old = np.random.RandomState(0).randn(1, 16, 8).astype(np.float32)
  new = np.zeros((1, 64, 8), np.float32)
  out = vit.resample_posemb(old, new)
  assert out.shape == (1, 64, 8)
  assert vit.resample_posemb(old, old) is old


def test_vit_load_from_npz(tmp_path):
  """Save our params as npz, reload through the load() surgery path."""
  model, params, x = init_vit(num_classes=4, variant="mu/16")
  fname = str(tmp_path / "ckpt.npz")
  u.npz_save({"params": params}, fname)
  restored = vit.load(params, fname, {"scan": False})
  y0, _ = model.apply({"params": params}, x)
  y1, _ = model.apply({"params": restored}, x)
  np.testing.assert_allclose(y0, y1, atol=1e-6)
  # Load into a scan model (layout conversion on the fly).
  model_scan = vit.Model(num_classes=4, variant="mu/16", scan=True)
  params_scan_init = model_scan.init(jax.random.PRNGKey(1), x)["params"]
  restored_scan = vit.load(params_scan_init, fname, {"scan": True})
  y2, _ = model_scan.apply({"params": restored_scan}, x)
  np.testing.assert_allclose(y0, y2, atol=1e-5)


def test_vit_load_dont_load_head():
  model, params, x = init_vit(num_classes=4, variant="mu/16")
  del model, x
  import tempfile, os
  with tempfile.TemporaryDirectory() as d:
    fname = os.path.join(d, "c.npz")
    u.npz_save({"params": params}, fname)
    # Pretend new task with different head size.
    model2, params2, _ = init_vit(rng=1, num_classes=7, variant="mu/16")
    del model2
    restored = vit.load(params2, fname, {}, dont_load=("head/.*",))
    np.testing.assert_array_equal(restored["head"]["kernel"],
                                  params2["head"]["kernel"])
    np.testing.assert_array_equal(
        restored["Transformer"]["encoder_norm"]["scale"],
        params["Transformer"]["encoder_norm"]["scale"])


def test_merge_params_mismatch_raises():
  with pytest.raises(ValueError) as e:
    common.merge_params({"a": 1, "b": 2}, {"a": 1, "c": 3})
  assert "c" in str(e.value) and "b" in str(e.value)
  merged = common.merge_params({"a": 10, "b": 2}, {"a": 1, "c": 3},
                               dont_load=("b", "c"))
  assert merged == {"a": 10, "c": 3}


def test_mixer_forward():
  model = mlp_mixer.Model(num_classes=10, variant="S/16", stoch_depth=0.1)
  x = jnp.zeros((2, 32, 32, 3))
  params = model.init(jax.random.PRNGKey(0), x)["params"]
  logits, out = model.apply({"params": params}, x)
  assert logits.shape == (2, 10)
  names = {n for n, _ in u.tree_flatten_with_names(params)[0]}
  assert "MixerBlock_0/token_mixing/Dense_0/kernel" in names
  assert "pre_head_layer_norm/scale" in names
  # Train mode with stochastic depth needs dropout rng.
  logits2, _ = model.apply({"params": params}, x, train=True,
                           rngs={"dropout": jax.random.PRNGKey(1)})
  assert logits2.shape == (2, 10)


def test_bit_forward():
  model = bit.Model(num_classes=10, depth=26, width=0.5)
  x = jnp.zeros((2, 64, 64, 3))
  params = model.init(jax.random.PRNGKey(0), x)["params"]
  logits, out = model.apply({"params": params}, x)
  assert logits.shape == (2, 10)
  assert out["stem"].shape == (2, 16, 16, 32)
  names = {n for n, _ in u.tree_flatten_with_names(params)[0]}
  assert "block1/unit1/conv1/kernel" in names
  assert "conv_root/kernel" in names


def test_bit_weight_standardization_invariance():
  """Scaling a conv kernel must not change the standardized output."""
  model = bit.Model(num_classes=None, depth=26, width=0.5)
  x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3), jnp.float32)
  params = model.init(jax.random.PRNGKey(0), x)["params"]
  y0, _ = model.apply({"params": params}, x)
  params2 = jax.tree.map(lambda v: v, params)
  params2["conv_root"]["kernel"] = params["conv_root"]["kernel"] * 10.0
  y1, _ = model.apply({"params": params2}, x)
  np.testing.assert_allclose(y0, y1, rtol=1e-4, atol=1e-4)
