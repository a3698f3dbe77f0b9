import io

import jax
import numpy as np
import pytest
from PIL import Image

from big_vision_tpu.pp import builder
import big_vision_tpu.pp.ops_general  # noqa: F401 registry side-effects
import big_vision_tpu.pp.ops_image  # noqa: F401


def make_jpeg(h=64, w=48, seed=0):
  img = np.random.RandomState(seed).randint(0, 255, (h, w, 3), np.uint8)
  buf = io.BytesIO()
  Image.fromarray(img).save(buf, format="JPEG")
  return buf.getvalue(), img


def run_full(spec, data, seed=0):
  pfn = builder.get_preprocess_fn(spec)
  return pfn(dict(data), np.random.default_rng(seed))


def test_value_range():
  out = run_full("value_range(-1, 1)", {"image": np.full((2, 2, 3), 255.0)})
  np.testing.assert_allclose(out["image"], 1.0, rtol=1e-6)
  out = run_full("value_range(-1, 1)", {"image": np.zeros((2, 2, 3))})
  np.testing.assert_allclose(out["image"], -1.0, rtol=1e-6)


def test_onehot_scalar_and_multi():
  out = run_full("onehot(5)", {"labels": np.int32(2)})
  np.testing.assert_array_equal(out["labels"], [0, 0, 1, 0, 0])
  out = run_full("onehot(5, on=0.9, off=0.02)",
                 {"labels": np.array([1, 3, 3])})
  np.testing.assert_allclose(out["labels"], [0.02, 0.9, 0.02, 0.9, 0.02],
                             rtol=1e-6)


def test_keep_drop_copy():
  data = {"a": np.ones(1), "b": np.zeros(1), "c": np.ones(2)}
  assert set(run_full("keep('a', 'b')", data)) == {"a", "b"}
  assert set(run_full("drop('c')", data)) == {"a", "b"}
  out = run_full("copy('a', 'z')", data)
  np.testing.assert_array_equal(out["z"], data["a"])


def test_structural_ops():
  out = run_full("squeeze_last_dim(key='x')", {"x": np.ones((4, 1))})
  assert out["x"].shape == (4,)
  out = run_full("reshape((4, 2), key='x')", {"x": np.arange(8)})
  assert out["x"].shape == (4, 2)
  out = run_full("concat(('a', 'b'), 'c', axis=0)",
                 {"a": np.ones(2), "b": np.zeros(3)})
  assert out["c"].shape == (5,)
  out = run_full("flatten", {"a": {"b": np.ones(1), "c": np.zeros(1)}})
  assert set(out) == {"a/b", "a/c"}


def test_pad_to_shape():
  out = run_full("pad_to_shape((5,), pad_value=7, key='t')",
                 {"t": np.array([1, 2])})
  np.testing.assert_array_equal(out["t"], [1, 2, 7, 7, 7])


def test_choice():
  data = {"opts": np.arange(10) * 10}
  out = run_full("choice(key='opts')", data)
  assert out["opts"].ndim == 0 and out["opts"] % 10 == 0
  out = run_full("choice(n=4, key='opts')", data)
  assert out["opts"].shape == (4,)
  assert sorted(out["opts"]) == list(out["opts"])  # order-preserving


def test_decode_resize_central_crop():
  jpeg, raw = make_jpeg(64, 48)
  out = run_full("decode|resize(32)|central_crop(24)", {"image": jpeg})
  assert out["image"].shape == (24, 24, 3)
  assert out["image"].dtype == np.uint8
  # Decode parity with PIL source data.
  out2 = run_full("decode", {"image": jpeg})
  pil = np.asarray(Image.open(io.BytesIO(jpeg)).convert("RGB"))
  np.testing.assert_array_equal(out2["image"], pil)
  del raw


def test_resize_small_keeps_aspect():
  jpeg, _ = make_jpeg(64, 48)
  out = run_full("decode|resize_small(24)", {"image": jpeg})
  assert out["image"].shape == (32, 24, 3)


def test_resize_long():
  jpeg, _ = make_jpeg(64, 48)
  out = run_full("decode|resize_long(32)", {"image": jpeg})
  assert out["image"].shape == (32, 24, 3)


def test_inception_crop_shapes():
  jpeg, _ = make_jpeg(100, 80)
  out = run_full("decode_jpeg_and_inception_crop(224)", {"image": jpeg})
  assert out["image"].shape == (224, 224, 3)
  out = run_full("decode|inception_crop(64)", {"image": jpeg})
  assert out["image"].shape == (64, 64, 3)


def test_random_crop_and_flip():
  img = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
  out = run_full("random_crop((4, 5))", {"image": img})
  assert out["image"].shape == (4, 5, 3)
  # flip_lr flips or not; both valid. Check it's one of the two.
  out = run_full("flip_lr", {"image": img}, seed=3)
  ok = (np.array_equal(out["image"], img)
        or np.array_equal(out["image"], img[:, ::-1]))
  assert ok


def test_vgg_and_clip_ranges():
  img = np.full((2, 2, 3), 128, np.uint8)
  out = run_full("vgg_value_range", {"image": img})
  assert out["image"].dtype == np.float32
  out = run_full("clip_value_range", {"image": img})
  assert np.all(np.abs(out["image"]) < 3)


def test_convert_to_video():
  out = run_full("convert_to_video(4)", {"image": np.ones((8, 8, 3))})
  assert out["image"].shape == (4, 8, 8, 3)
  assert np.all(out["image"][1:] == 0)


def test_builder_split_train_chain():
  spec = ("decode_jpeg_and_inception_crop(224)|flip_lr|"
          "value_range(-1, 1)|onehot(10)|keep('image', 'labels')")
  pfn = builder.get_preprocess_fn(spec)
  assert [o.name for o in pfn.host_ops] == [
      "decode_jpeg_and_inception_crop(224)"]
  assert len(pfn.device_ops) == 4


def test_builder_split_eval_chain():
  spec = "decode|resize_small(256)|central_crop(224)|value_range(-1, 1)"
  pfn = builder.get_preprocess_fn(spec)
  # resize_small output is variable-shape, so central_crop(224) (the
  # staticizer) still sees variable input and must run on host; everything
  # after it is statically shaped and runs on device.
  assert [o.name for o in pfn.host_ops] == [
      "decode", "resize_small(256)", "central_crop(224)"]
  assert [o.name for o in pfn.device_ops] == ["value_range(-1, 1)"]


def test_builder_split_static_input():
  pfn = builder.get_preprocess_fn("value_range(-1, 1)|onehot(10)")
  assert not pfn.host_ops
  assert len(pfn.device_ops) == 2


def test_device_phase_batched_matches_host():
  """The jitted, vmapped device phase must agree with per-example host run."""
  spec = "value_range(-1, 1)|onehot(4)|keep('image', 'labels')"
  pfn = builder.get_preprocess_fn(spec)
  rs = np.random.RandomState(0)
  batch = {
      "image": rs.randint(0, 255, (6, 12, 12, 3)).astype(np.uint8),
      "labels": rs.randint(0, 4, (6,)).astype(np.int32),
  }
  key = jax.random.PRNGKey(0)
  out_dev = jax.jit(pfn.device)(batch, key)
  for i in range(6):
    ex = {k: v[i] for k, v in batch.items()}
    out_host = pfn(ex)
    np.testing.assert_allclose(out_dev["image"][i], out_host["image"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out_dev["labels"][i], out_host["labels"],
                               rtol=1e-6, atol=1e-6)


def test_empty_pipeline_is_identity():
  pfn = builder.get_preprocess_fn("")
  data = {"x": np.ones(3)}
  np.testing.assert_array_equal(pfn(data)["x"], data["x"])


def test_full_train_pipeline_end_to_end():
  jpeg, _ = make_jpeg(80, 100, seed=1)
  spec = ("decode_jpeg_and_inception_crop(32)|flip_lr|value_range(-1, 1)|"
          "onehot(10, key='label', key_result='labels')|"
          "keep('image', 'labels')")
  pfn = builder.get_preprocess_fn(spec)
  rng = np.random.default_rng(0)
  # Host phase then batched device phase, as the input pipeline does it.
  exs = [pfn.host({"image": jpeg, "label": np.int32(3)}, rng)
         for _ in range(4)]
  batch = {k: np.stack([e[k] for e in exs]) for k in exs[0]}
  out = jax.jit(pfn.device)(batch, jax.random.PRNGKey(0))
  assert out["image"].shape == (4, 32, 32, 3)
  assert out["image"].dtype == np.float32
  assert set(out) == {"image", "labels"}
  assert float(out["image"].min()) >= -1 and float(out["image"].max()) <= 1
  np.testing.assert_array_equal(np.argmax(out["labels"], -1), [3, 3, 3, 3])
