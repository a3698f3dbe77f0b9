"""NaFlex pp/model and CLIPPO one-tower tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from big_vision_tpu.models.proj.clippo import one_tower
from big_vision_tpu.models.proj.image_text import naflex_vit
from big_vision_tpu.pp import builder
from big_vision_tpu.pp.proj.image_text import ops_naflex
import big_vision_tpu.pp.proj.clippo.pp_ops  # noqa: F401
import big_vision_tpu.pp.ops_general  # noqa: F401


def test_size_for_seq():
  ratio, (th, tw) = ops_naflex.get_image_size_for_seq(
      (480, 640), patch_size=16, max_sequence_len=256)
  assert th % 16 == 0 and tw % 16 == 0
  assert (th // 16) * (tw // 16) <= 256
  # Aspect roughly preserved.
  assert abs((th / tw) - (480 / 640)) < 0.15


def test_naflex_pp_chain():
  rs = np.random.RandomState(0)
  img = rs.randint(0, 255, (100, 140, 3), np.uint8)
  pfn = builder.get_preprocess_fn(
      "resize_to_sequence(16, 36)|patchify(16)|flatten")
  out = pfn.host({"image": img}, np.random.default_rng(0))
  n = out["image/patches"].shape[0]
  assert n <= 36
  assert out["image/patches"].shape[1] == 16 * 16 * 3
  assert out["image/yidx"].shape == (n,)
  assert (out["image/type"] == 1).all()


def test_naflex_model_masks_padding():
  model = naflex_vit.Model(num_classes=6, variant="mu", nposemb=4,
                           posemb="learn_2d(8)", pool_type="gap")
  n, d = 10, 8 * 8 * 3
  rs = np.random.RandomState(0)
  patches = jnp.asarray(rs.randn(2, n, d), jnp.float32)
  ptype = jnp.asarray(np.array([[1] * 6 + [0] * 4, [1] * 10]), jnp.int32)
  yidx = jnp.tile(jnp.arange(n)[None] // 5, (2, 1))
  xidx = jnp.tile(jnp.arange(n)[None] % 5, (2, 1))
  x = (patches, ptype, yidx, xidx)
  params = model.init(jax.random.PRNGKey(0), x)["params"]
  logits, out = model.apply({"params": params}, x)
  assert logits.shape == (2, 6)
  # Padding invariance: change padded patches, output must not change.
  patches2 = patches.at[0, 7].set(123.0)
  logits2, _ = model.apply({"params": params},
                           (patches2, ptype, yidx, xidx))
  np.testing.assert_allclose(np.asarray(logits[0]), np.asarray(logits2[0]),
                             atol=1e-5)


def test_render_text_op():
  pfn = builder.get_preprocess_fn("render_unifont(64)")
  out = pfn.host({"texts": "hello world"}, np.random.default_rng(0))
  img = out["image"]
  assert img.shape == (64, 64, 3) and img.dtype == np.uint8
  assert (img == 0).any() and (img == 127).any()  # text + background
  # Different text -> different rendering.
  out2 = pfn.host({"texts": "bye"}, np.random.default_rng(0))
  assert not np.array_equal(out2["image"], img)


def test_clippo_one_tower():
  model = one_tower.Model(
      image=dict(variant="mu/16", pool_type="gap", head_zeroinit=False),
      out_dim=16)
  img = jnp.zeros((2, 32, 32, 3))
  txtimg = jnp.ones((2, 32, 32, 3))
  params = model.init(jax.random.PRNGKey(0), img, txtimg)["params"]
  zimg, ztxt, out = model.apply({"params": params}, img, txtimg)
  assert zimg.shape == (2, 16) and ztxt.shape == (2, 16)
  # ONE tower: same params used for both inputs.
  zimg2, _, _ = model.apply({"params": params}, txtimg, None)
  np.testing.assert_allclose(np.asarray(zimg2), np.asarray(ztxt),
                             atol=1e-6)


def test_naflex_flash_matches_xla():
  """Flash seg path (padding-only) == the bool-mask xla path."""
  def build(attn_impl):
    return naflex_vit.Model(num_classes=6, variant="mu", nposemb=4,
                            posemb="learn_2d(8)", pool_type="gap",
                            attn_impl=attn_impl)
  m_x, m_f = build("xla"), build("flash")
  n, d = 10, 8 * 8 * 3
  rs = np.random.RandomState(0)
  patches = jnp.asarray(rs.randn(2, n, d), jnp.float32)
  ptype = jnp.asarray(np.array([[1] * 6 + [0] * 4, [1] * 10]), jnp.int32)
  yidx = jnp.tile(jnp.arange(n)[None] // 5, (2, 1))
  xidx = jnp.tile(jnp.arange(n)[None] % 5, (2, 1))
  x = (patches, ptype, yidx, xidx)
  params = m_x.init(jax.random.PRNGKey(0), x)["params"]
  lx, _ = m_x.apply({"params": params}, x)
  lf, _ = m_f.apply({"params": params}, x)
  np.testing.assert_allclose(np.asarray(lf), np.asarray(lx), atol=2e-5)
