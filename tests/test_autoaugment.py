"""JAX augmentation ops vs PIL ground truth (the ops PIL defines) and
structural checks for the TF-specific variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

from big_vision_tpu.pp import autoaugment as aa


@pytest.fixture
def img():
  rs = np.random.RandomState(0)
  # Structured image (gradients + noise) so histograms aren't degenerate.
  base = np.linspace(0, 200, 64 * 48 * 3).reshape(64, 48, 3)
  return np.clip(base + rs.randint(0, 55, (64, 48, 3)), 0, 255).astype(
      np.uint8)


def test_invert(img):
  np.testing.assert_array_equal(aa.invert(img), 255 - img)


def test_solarize_matches_pil(img):
  ours = np.asarray(aa.solarize(img, 128))
  pil = np.asarray(ImageOps.solarize(Image.fromarray(img), 128))
  np.testing.assert_array_equal(ours, pil)


def test_posterize_matches_pil(img):
  ours = np.asarray(aa.posterize(img, 3))
  pil = np.asarray(ImageOps.posterize(Image.fromarray(img), 3))
  np.testing.assert_array_equal(ours, pil)


def test_equalize_close_to_pil(img):
  ours = np.asarray(aa.equalize(img)).astype(int)
  pil = np.asarray(ImageOps.equalize(Image.fromarray(img))).astype(int)
  # TF's equalize differs from PIL by LUT rounding; stays within a few
  # gray levels on smooth images.
  assert np.mean(np.abs(ours - pil)) < 6.0


def test_autocontrast_bounds(img):
  out = np.asarray(aa.autocontrast(img))
  for c in range(3):
    # Float truncation (matching TF's cast) can land on 254.
    assert out[..., c].min() == 0
    assert out[..., c].max() >= 254


def test_brightness_matches_pil(img):
  ours = np.asarray(aa.brightness(img, 0.5)).astype(int)
  pil = np.asarray(
      ImageEnhance.Brightness(Image.fromarray(img)).enhance(0.5)).astype(int)
  assert np.abs(ours - pil).max() <= 1  # rounding mode differs


def test_color_close_to_pil(img):
  ours = np.asarray(aa.color(img, 0.5)).astype(int)
  pil = np.asarray(
      ImageEnhance.Color(Image.fromarray(img)).enhance(0.5)).astype(int)
  assert np.mean(np.abs(ours - pil)) < 2.0


def test_blend_endpoints(img):
  other = 255 - img
  np.testing.assert_array_equal(aa.blend(img, other, 0.0), img)
  np.testing.assert_array_equal(aa.blend(img, other, 1.0), other)


def test_translate_semantics(img):
  # translate_x(pixels) shifts content LEFT by `pixels` (TF semantics:
  # translate([-pixels, 0])).
  out = np.asarray(aa.translate_x(img, 10))
  np.testing.assert_array_equal(out[:, :-10], img[:, 10:])
  assert np.all(out[:, -10:] == 128)
  out = np.asarray(aa.translate_y(img, 7))
  np.testing.assert_array_equal(out[:-7], img[7:])
  assert np.all(out[-7:] == 128)


def test_rotate_90_degrees():
  img = np.zeros((32, 32, 3), np.uint8)
  img[0, :, :] = 255  # top row white
  out = np.asarray(aa.rotate(img, 90.0))
  # CCW rotation moves the top row to the left column.
  assert out[:, 0].mean() > out[:, -1].mean()
  assert np.asarray(aa.rotate(img, 0.0)).sum() == img.sum()


def test_rotate_matches_pil_interior():
  rs = np.random.RandomState(1)
  img = rs.randint(0, 255, (48, 48, 3), np.uint8)
  ours = np.asarray(aa.rotate(img, 30.0)).astype(int)
  pil = np.asarray(
      Image.fromarray(img).rotate(30, resample=Image.Resampling.NEAREST,
                                  fillcolor=(128, 128, 128))).astype(int)
  # NEAREST rounding can differ per pixel; most pixels should agree.
  agree = np.mean(np.all(ours == pil, axis=-1))
  assert agree > 0.9, agree


def test_shear_fill(img):
  out = np.asarray(aa.shear_x(img, 0.3))
  assert (out == 128).any()
  np.testing.assert_array_equal(np.asarray(aa.shear_x(img, 0.0)), img)


def test_cutout(img):
  out = np.asarray(aa.cutout(img, jax.random.PRNGKey(0), pad_size=8))
  n_replaced = np.sum(np.all(out == 128, axis=-1)) - np.sum(
      np.all(img == 128, axis=-1))
  assert 0 < n_replaced <= 16 * 16


def test_sharpness_identity_at_one(img):
  np.testing.assert_array_equal(np.asarray(aa.sharpness(img, 1.0)), img)


def test_randaug_pipeline(img):
  out = aa.distort_image_with_randaugment(
      jnp.asarray(img), num_layers=2, magnitude=10,
      rng=jax.random.PRNGKey(0))
  assert out.shape == img.shape and out.dtype == jnp.uint8
  # Different seeds usually give different augmentations.
  out2 = aa.distort_image_with_randaugment(
      jnp.asarray(img), num_layers=2, magnitude=10,
      rng=jax.random.PRNGKey(1))
  assert not np.array_equal(np.asarray(out), np.asarray(out2))


def test_randaug_pp_op_batched():
  # NOTE: images must be translate_const-sized (>100px); magnitude-10
  # translate moves content by up to 100 pixels and would wipe tiny test
  # images to the uniform fill value.
  from big_vision_tpu.pp import builder
  import big_vision_tpu.pp.ops_general  # noqa: F401
  rs = np.random.RandomState(0)
  batch = {"image": rs.randint(0, 255, (4, 128, 128, 3)).astype(np.uint8)}
  pfn = builder.get_preprocess_fn("randaug(2, 10)|value_range(-1, 1)")
  out = jax.jit(pfn.device)(batch, jax.random.PRNGKey(0))
  assert out["image"].shape == (4, 128, 128, 3)
  assert out["image"].dtype == jnp.float32
  # Per-example randomness: examples with identical input should differ.
  batch2 = {"image": np.tile(batch["image"][:1], (4, 1, 1, 1))}
  out2 = jax.jit(pfn.device)(batch2, jax.random.PRNGKey(0))
  imgs = np.asarray(out2["image"])
  assert any(not np.allclose(imgs[0], imgs[i]) for i in range(1, 4))
