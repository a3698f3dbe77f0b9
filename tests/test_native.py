"""Native (C++/libjpeg-turbo) data path: parity with PIL + pp integration."""

import io

import numpy as np
import pytest
from PIL import Image

from big_vision_tpu import native


def jpeg_fixture(h=120, w=160, seed=0):
  rng = np.random.default_rng(seed)
  arr = rng.integers(0, 255, (h, w, 3), np.uint8)
  buf = io.BytesIO()
  Image.fromarray(arr).save(buf, format="JPEG", quality=90)
  return buf.getvalue()


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def test_jpeg_size():
  assert native.jpeg_size(jpeg_fixture(120, 160)) == (120, 160)


def test_full_decode_bit_exact_with_pil():
  data = jpeg_fixture()
  ours = native.decode_crop_resize(data)
  pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
  np.testing.assert_array_equal(ours, pil)


def test_crop_decode_interior_exact():
  data = jpeg_fixture()
  crop = native.decode_crop_resize(data, crop=(16, 24, 64, 80))
  pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
  ref = pil[16:80, 24:104]
  # Crop-window decode may differ slightly at boundary rows (chroma
  # upsampling context) - exactly like TF's decode_and_crop_jpeg.
  diff = np.abs(crop.astype(int) - ref.astype(int))
  assert diff[4:-4, 4:-4].max() == 0
  assert diff.mean() < 1.0


def test_crop_resize_shapes_and_range():
  data = jpeg_fixture()
  out = native.decode_crop_resize(data, crop=(0, 0, 100, 100),
                                  out_size=(224, 224))
  assert out.shape == (224, 224, 3) and out.dtype == np.uint8


def test_idct_downscale_close_to_full_resize():
  # 4x downscale triggers IDCT scaling; result should approximate a plain
  # decode+bilinear-resize.
  data = jpeg_fixture(256, 256)
  fast = native.decode_crop_resize(data, crop=(0, 0, 256, 256),
                                   out_size=(56, 56)).astype(int)
  pil = Image.open(io.BytesIO(data)).convert("RGB").resize(
      (56, 56), Image.Resampling.BILINEAR)
  assert np.abs(fast - np.asarray(pil, int)).mean() < 12


def test_batch_matches_single():
  data = [jpeg_fixture(seed=s) for s in range(5)]
  crops = np.asarray([[0, 0, 100, 120]] * 5, np.int32)
  batch = native.decode_crop_resize_batch(data, crops, (64, 64))
  single = native.decode_crop_resize(data[3], crop=(0, 0, 100, 120),
                                     out_size=(64, 64))
  np.testing.assert_array_equal(batch[3], single)


def test_corrupt_jpeg_raises():
  with pytest.raises(ValueError):
    native.decode_crop_resize(b"\xff\xd8\xffgarbage", crop=(0, 0, 10, 10),
                              out_size=(8, 8))


def test_pp_decode_uses_native_and_matches_pil():
  from big_vision_tpu.pp import builder
  import big_vision_tpu.pp.ops_image  # noqa: F401
  data = jpeg_fixture()
  out = builder.get_preprocess_fn("decode")({"image": data})
  pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
  np.testing.assert_array_equal(out["image"], pil)


def test_pp_fused_inception_crop_shape():
  from big_vision_tpu.pp import builder
  import big_vision_tpu.pp.ops_image  # noqa: F401
  data = jpeg_fixture(300, 400)
  pfn = builder.get_preprocess_fn("decode_jpeg_and_inception_crop(224)")
  out = pfn.host({"image": data}, np.random.default_rng(0))
  assert out["image"].shape == (224, 224, 3)


def test_yuv420_path_matches_rgb_decode():
  """YUV fast path + device conversion ~= RGB decode (chroma-subsampled)."""
  import io

  import jax
  import numpy as np
  from PIL import Image

  from big_vision_tpu.pp import builder
  import big_vision_tpu.pp.ops_image  # noqa: F401

  rs = np.random.RandomState(0)
  # Smooth image: chroma subsampling differences stay small.
  base = rs.randint(0, 255, (8, 10, 3), np.uint8)
  img = np.asarray(Image.fromarray(base).resize((320, 256),
                                                Image.BILINEAR))
  buf = io.BytesIO()
  Image.fromarray(img).save(buf, format="JPEG", quality=95)
  raw = buf.getvalue()

  # Identical crop box: area 100% + ratio 1 makes the box deterministic
  # enough; use central-crop-free full decode via resize instead.
  pfn_yuv = builder.get_preprocess_fn(
      "decode_jpeg_and_inception_crop_yuv(128, area_min=100,"
      " area_max=100, ratio_min=1.0, ratio_max=1.0)|yuv420_to_rgb")
  pfn_rgb = builder.get_preprocess_fn(
      "decode_jpeg_and_inception_crop(128, area_min=100, area_max=100,"
      " ratio_min=1.0, ratio_max=1.0)")
  out_yuv = pfn_yuv({"image": raw}, np.random.default_rng(3))
  out_rgb = pfn_rgb({"image": raw}, np.random.default_rng(3))

  got = np.asarray(out_yuv["image"], np.float32)
  want = np.asarray(out_rgb["image"], np.float32)
  assert got.shape == want.shape == (128, 128, 3)
  # Chroma is stored at half resolution in the JPEG itself; the two
  # reconstructions must agree closely on a smooth image.
  assert np.mean(np.abs(got - want)) < 3.0
  assert np.percentile(np.abs(got - want), 99) < 12.0
