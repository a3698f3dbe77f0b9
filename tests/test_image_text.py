import jax
import jax.numpy as jnp
import numpy as np
import pytest

import big_vision_tpu.utils as u
from big_vision_tpu.models.proj.image_text import text_transformer, two_towers
from big_vision_tpu.parallel import contrastive
from big_vision_tpu.pp.tokenizer import get_tokenizer

# Multi-minute on the 1-CPU CI host (jit compiles dominate): heavy tier.
pytestmark = pytest.mark.heavy


P = jax.sharding.PartitionSpec


def test_text_transformer_shapes():
  model = text_transformer.Model(num_classes=32, variant="mu",
                                 vocab_size=100, pool_type="last")
  txt = jnp.ones((2, 16), jnp.int32)
  params = model.init(jax.random.PRNGKey(0), txt)["params"]
  z, out = model.apply({"params": params}, txt)
  assert z.shape == (2, 32)
  assert out["vocab_logits"].shape == (2, 16, 100)


@pytest.mark.parametrize("pool", ["last", "first", "gap", "map"])
def test_text_transformer_pools(pool):
  model = text_transformer.Model(num_classes=8, variant="mu",
                                 vocab_size=50, pool_type=pool)
  txt = jnp.ones((2, 12), jnp.int32)
  params = model.init(jax.random.PRNGKey(0), txt)["params"]
  z, _ = model.apply({"params": params}, txt)
  assert z.shape == (2, 8)


def make_two_towers(bias=True):
  # head_zeroinit=False: the default zero-init head gives exactly-zero
  # embeddings at init (true in the reference too), degenerate for tests.
  model = two_towers.Model(
      image=dict(variant="mu/16", pool_type="gap", head_zeroinit=False),
      text=dict(variant="mu", vocab_size=64),
      out_dim=16, temperature_init=10.0,
      bias_init=-2.0 if bias else None)
  img = jnp.zeros((2, 32, 32, 3))
  txt = jnp.ones((2, 8), jnp.int32)
  params = model.init(jax.random.PRNGKey(0), img, txt)["params"]
  return model, params, img, txt


def test_two_towers_outputs():
  model, params, img, txt = make_two_towers()
  zimg, ztxt, out = model.apply({"params": params}, img, txt)
  assert zimg.shape == (2, 16) and ztxt.shape == (2, 16)
  np.testing.assert_allclose(np.linalg.norm(zimg, axis=-1), 1.0, rtol=1e-4)
  np.testing.assert_allclose(float(out["t"][0]), 10.0, rtol=1e-5)
  assert float(out["b"][0]) == -2.0
  # Single-tower calls work (for eval paths).
  zimg2, ztxt2, _ = model.apply({"params": params}, img, None)
  assert ztxt2 is None
  np.testing.assert_allclose(zimg2, zimg, atol=1e-6)


def test_two_towers_load_from_npz(tmp_path):
  model, params, img, txt = make_two_towers()
  fname = str(tmp_path / "tt.npz")
  u.npz_save({"params": params}, fname)
  restored = two_towers.load(
      params, fname, dict(image=dict(variant="mu/16"), bias_init=-2.0,
                          text=dict(variant="mu", vocab_size=64)))
  z0, _, _ = model.apply({"params": params}, img, txt)
  z1, _, _ = model.apply({"params": restored}, img, txt)
  np.testing.assert_allclose(z0, z1, atol=1e-6)


def test_chunked_siglip_equals_global():
  rs = np.random.RandomState(0)
  B, D = 32, 16
  zimg = rs.randn(B, D).astype(np.float32)
  ztxt = rs.randn(B, D).astype(np.float32)
  zimg /= np.linalg.norm(zimg, axis=-1, keepdims=True)
  ztxt /= np.linalg.norm(ztxt, axis=-1, keepdims=True)
  t, b = jnp.float32(10.0), jnp.float32(-5.0)

  mesh = u.create_device_mesh([("data", -1)])
  sharding = jax.sharding.NamedSharding(mesh, P("data"))
  zi = u.reshard(jnp.asarray(zimg), sharding)
  zt = u.reshard(jnp.asarray(ztxt), sharding)

  loss_chunked = contrastive.siglip_loss_fn(mesh)
  got = jax.jit(loss_chunked)(zi, zt, t, b)
  want = contrastive.global_siglip_loss(jnp.asarray(zimg),
                                        jnp.asarray(ztxt), t, b)
  np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_chunked_siglip_grads_match_global():
  rs = np.random.RandomState(1)
  B, D = 16, 8
  zimg = jnp.asarray(rs.randn(B, D), jnp.float32)
  ztxt = jnp.asarray(rs.randn(B, D), jnp.float32)
  t, b = jnp.float32(5.0), jnp.float32(-2.0)

  mesh = u.create_device_mesh([("data", -1)])
  sharding = jax.sharding.NamedSharding(mesh, P("data"))
  loss_chunked = contrastive.siglip_loss_fn(mesh)

  g_chunk = jax.jit(jax.grad(loss_chunked, argnums=(0, 1, 2, 3)))(
      u.reshard(zimg, sharding), u.reshard(ztxt, sharding), t, b)
  g_glob = jax.grad(contrastive.global_siglip_loss, argnums=(0, 1, 2, 3))(
      zimg, ztxt, t, b)
  for gc, gg, name in zip(g_chunk, g_glob, ["zimg", "ztxt", "t", "b"]):
    np.testing.assert_allclose(np.asarray(gc), np.asarray(gg), rtol=2e-4,
                               atol=1e-6, err_msg=name)


def test_tokenize_eos_modes():
  from big_vision_tpu.pp import builder
  import big_vision_tpu.pp.ops_text  # noqa: F401
  tok = get_tokenizer("test(100)")
  a = tok.to_int("hello")[0]

  def run(eos, text, max_len=3, pad_value=0):
    pfn = builder.get_preprocess_fn(
        f"tokenize({max_len}, eos='{eos}', model='test(100)', "
        f"pad_value={pad_value}, inkey='text')")
    return list(pfn.host({"text": text}, np.random.default_rng(0))["labels"])

  # Mirrors the documented truth table (ref ops_text.py:127-152).
  assert run("none", "hello") == [a, 0, 0]
  assert run("none", "hello hello hello") == [a, a, a]
  assert run("yes", "hello") == [a, 1, 0]
  assert run("yes", "hello hello hello") == [a, a, a]
  assert run("sticky", "hello") == [a, 1, 0]
  assert run("sticky", "hello hello") == [a, a, 1]
  assert run("sticky", "hello hello hello") == [a, a, 1]
  assert run("sticky", "hello", pad_value=1) == [a, 1, 1]


def test_tokenize_multi_choice():
  from big_vision_tpu.pp import builder
  import big_vision_tpu.pp.ops_text  # noqa: F401
  pfn = builder.get_preprocess_fn(
      "tokenize(4, eos='sticky', model='test(100)', inkey='texts', "
      "outkey='labels')")
  out = pfn.host({"texts": ["foo bar", "baz"]}, np.random.default_rng(0))
  assert out["labels"].shape == (4,)


def test_strfmt_and_lower():
  from big_vision_tpu.pp import builder
  import big_vision_tpu.pp.ops_text  # noqa: F401
  pfn = builder.get_preprocess_fn(
      "strfmt('a photo of a {label}.', outkey='text')|lower(key='text')")
  out = pfn.host({"label": "DOG"}, np.random.default_rng(0))
  assert out["text"] == "a photo of a dog."
