"""givt-vit VAE, iRevNet adaptor, BERT, batch_shmap."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Multi-minute on the 1-CPU CI host (jit compiles dominate): heavy tier.
pytestmark = pytest.mark.heavy



def test_givt_vit_vae_roundtrip_shapes():
  from big_vision_tpu.models.proj.givt import vit as givt_vit
  model = givt_vit.Model(
      input_size=(32, 32), patch_size=(8, 8), code_len=8,
      codeword_dim=12, width=32, enc_depth=1, dec_depth=1, num_heads=2)
  x = jnp.zeros((2, 32, 32, 3))
  params = model.init(jax.random.PRNGKey(0), x)["params"]
  mu, logvar = model.apply({"params": params}, x, method=model.encode)
  assert mu.shape == (2, 8, 12) and logvar.shape == (2, 8, 12)
  dec = model.apply({"params": params}, mu, method=model.decode)
  assert dec.shape == (2, 32, 32, 3)
  assert float(jnp.max(jnp.abs(dec))) <= 1.0


def test_givt_vit_inout_specs():
  from big_vision_tpu.models.proj.givt import vit as givt_vit
  model = givt_vit.Model(
      input_size=(16, 16), patch_size=(8, 8), code_len=4,
      codeword_dim=8, width=32, enc_depth=1, dec_depth=1, num_heads=2,
      inout_specs={"semantics": (0, 5), "instances": (1, 7)})
  x = jnp.zeros((2, 16, 16, 2), jnp.int32)
  params = model.init(jax.random.PRNGKey(0), x)["params"]
  mu, _ = model.apply({"params": params}, x, method=model.encode)
  dec = model.apply({"params": params}, mu, method=model.decode)
  assert dec["semantics"].shape == (2, 16, 16, 5)
  assert dec["instances"].shape == (2, 16, 16, 7)


def test_irevnet_exact_inverse():
  from big_vision_tpu.models.proj.givt import adaptor
  model = adaptor.Model(num_blocks=3, num_channels=8)
  x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 8), jnp.float32)
  params = model.init(jax.random.PRNGKey(0), x, train=False)["params"]
  z = model.apply({"params": params}, x, train=False,
                  method=model.forward)
  assert z.shape == x.shape
  assert not np.allclose(np.asarray(z), np.asarray(x))
  x_back = model.apply({"params": params}, z, train=False,
                       method=model.inverse)
  np.testing.assert_allclose(np.asarray(x_back), np.asarray(x),
                             atol=1e-5)


def test_bert_forward_and_padding_mask():
  from big_vision_tpu.models.proj.flaxformer import bert
  # Tiny config for the test.
  bert.CONFIGS["tiny"] = dict(width=32, depth=2, mlp_dim=64, num_heads=2)
  model = bert.Model(config="tiny", num_classes=4, head_zeroinit=False)
  text = jnp.asarray([[2, 5, 9, 0, 0], [2, 7, 0, 0, 0]], jnp.int32)
  params = model.init(jax.random.PRNGKey(0), text)["params"]
  logits, out = model.apply({"params": params}, text)
  assert logits.shape == (2, 4)
  assert out["pre_logits"].shape == (2, 32)

  # Padding invariance at the encoder level (fixed explicit mask):
  # changing a masked-out token must not change the CLS output.
  enc = bert.BertEncoder(**bert.CONFIGS["tiny"])
  ids = jnp.asarray([[2, 5, 9, 3, 7]], jnp.int32)
  pos = jnp.arange(5, dtype=jnp.int32)[None]
  seg = jnp.zeros((1, 5), jnp.int32)
  mask = jnp.asarray([[1, 1, 1, 0, 0]], jnp.int32)
  eparams = enc.init(jax.random.PRNGKey(1), ids, pos, seg, mask)["params"]
  y1 = enc.apply({"params": eparams}, ids, pos, seg, mask)
  y2 = enc.apply({"params": eparams}, ids.at[0, 4].set(11), pos, seg,
                 mask)
  np.testing.assert_allclose(np.asarray(y1[0, 0]), np.asarray(y2[0, 0]),
                             atol=1e-5)


def test_subsample_batch():
  from big_vision_tpu.models.proj.image_text import utils as it_utils
  x = {"a": jnp.arange(16), "b": jnp.arange(32).reshape(16, 2)}
  y = it_utils.subsample_batch(x, 2)  # No ambient mesh: plain fn.
  assert y["a"].shape == (8,) and y["b"].shape == (8, 2)
  np.testing.assert_array_equal(np.asarray(y["a"]), np.arange(0, 16, 2))
  # With a mesh, subsampling happens per shard.
  mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))
  xs = jax.device_put(
      jnp.arange(16), jax.sharding.NamedSharding(
          mesh, jax.sharding.PartitionSpec("data")))
  with mesh:
    ys = it_utils.subsample_batch({"a": xs}, 2)["a"]
  assert ys.shape == (8,)
