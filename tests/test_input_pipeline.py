import jax
import numpy as np
import pytest

import big_vision_tpu.input_pipeline as ip
import big_vision_tpu.utils as u
from big_vision_tpu.datasets import core as ds_core
import big_vision_tpu.pp.ops_general  # noqa: F401
import big_vision_tpu.pp.ops_image  # noqa: F401


TRAIN_PP = ("decode_jpeg_and_inception_crop(16)|flip_lr|value_range(-1,1)|"
            "onehot(10, key='label', key_result='labels')|"
            "keep('image', 'labels')")
EVAL_PP = ("decode|resize_small(20)|central_crop(16)|value_range(-1,1)|"
           "onehot(10, key='label', key_result='labels')|"
           "keep('image', 'labels')")


def test_even_split_bounds():
  assert ds_core.even_split_bounds(10, 4, 0) == (0, 3)
  assert ds_core.even_split_bounds(10, 4, 1) == (3, 6)
  assert ds_core.even_split_bounds(10, 4, 3) == (8, 10)
  # Full coverage, no overlap.
  spans = [ds_core.even_split_bounds(10, 4, i) for i in range(4)]
  assert spans[0][0] == 0 and spans[-1][1] == 10
  assert all(spans[i][1] == spans[i + 1][0] for i in range(3))


def test_training_iterator_shapes_and_sharding():
  cfg = dict(
      data=dict(name="synthetic", n=64, num_classes=10, h=24, w=24),
      batch_size=16, pp=TRAIN_PP, shuffle_buffer_size=32, prefetch=1)
  it, total = ip.training(cfg, seed=0)
  assert total == 64
  batch = next(it)
  assert set(batch) == {"image", "labels"}
  assert batch["image"].shape == (16, 16, 16, 3)
  assert str(batch["image"].dtype) == "float32"
  assert batch["labels"].shape == (16, 10)
  assert len(batch["image"].sharding.device_set) == 8
  # Iterates past one epoch without stopping (infinite repeat).
  for _ in range(5):
    batch = next(it)


def test_training_is_deterministic_given_seed():
  cfg = dict(data=dict(name="synthetic", n=32, num_classes=10, h=24, w=24),
             batch_size=8, pp=TRAIN_PP, shuffle_buffer_size=16, prefetch=0)
  b1 = next(ip.training(cfg, seed=7)[0])
  b2 = next(ip.training(cfg, seed=7)[0])
  np.testing.assert_allclose(np.asarray(b1["image"]),
                             np.asarray(b2["image"]))


def test_training_mixture():
  sub1 = dict(name="synthetic", n=16, num_classes=10, h=24, w=24)
  sub2 = dict(name="synthetic", n=16, num_classes=10, h=30, w=30)
  cfg = dict(data=[(0.5, sub1), (0.5, sub2)],
             batch_size=8, pp=TRAIN_PP, shuffle_buffer_size=8, prefetch=0)
  it, total = ip.training(cfg, seed=0)
  assert total == 32
  batch = next(it)
  assert batch["image"].shape == (8, 16, 16, 3)


def test_inference_padding_and_mask():
  # 26 examples, local batch 8 -> 4 batches, 6 padded examples.
  make_iter, num_batches = ip.make_for_inference(
      dict(name="synthetic", n=26, num_classes=10, h=24, w=24),
      pp=EVAL_PP, batch_size=8)
  assert num_batches == 4
  masks = []
  for batch in make_iter():
    assert batch["image"].shape == (8, 16, 16, 3)
    masks.append(np.asarray(u.get_local_slice_from_fsarray(batch["_mask"])))
  masks = np.concatenate(masks)
  assert masks.sum() == 26
  assert masks.shape[0] == 32
  # Padding is at the end.
  assert np.all(masks[:26] == 1) and np.all(masks[26:] == 0)


def test_inference_batch_smaller_than_device_count_pads():
  # batch_size=3 < 8 local devices: the local batch must be rounded up to
  # the device count (the _mask contract absorbs the extra padding) instead
  # of crashing at the host->HBM split.
  import pytest
  with pytest.warns(UserWarning, match="padding the eval batch"):
    make_iter, num_batches = ip.make_for_inference(
        dict(name="synthetic", n=5, num_classes=10, h=24, w=24),
        pp=EVAL_PP, batch_size=3)
  masks = []
  for batch in make_iter():
    assert batch["image"].shape[0] % 8 == 0
    masks.append(np.asarray(u.get_local_slice_from_fsarray(batch["_mask"])))
  masks = np.concatenate(masks)
  assert masks.sum() == 5
  assert np.all(masks[:5] == 1) and np.all(masks[5:] == 0)


def test_inference_is_repeatable():
  make_iter, _ = ip.make_for_inference(
      dict(name="synthetic", n=10, num_classes=10, h=24, w=24),
      pp=EVAL_PP, batch_size=8)
  a = [np.asarray(b["image"]) for b in make_iter()]
  b = [np.asarray(b["image"]) for b in make_iter()]
  for x, y in zip(a, b):
    np.testing.assert_allclose(x, y)


def test_inference_cache_raw_skips_dataset_io():
  """cache_raw memoizes raw examples: the source is read once, results
  are identical across runs (reference cache='raw_data' level)."""
  from big_vision_tpu.datasets import core as ds_core

  reads = {"n": 0}
  real_get = ds_core.get

  def counting_get(**kw):
    src = real_get(**kw)
    orig = src.get_examples

    def spy(*a, **k):
      reads["n"] += 1
      return orig(*a, **k)

    src.get_examples = spy
    return src

  ds_core_get, ds_core.get = ds_core.get, counting_get
  try:
    make_iter, _ = ip.make_for_inference(
        dict(name="synthetic", n=10, num_classes=10, h=24, w=24),
        pp=EVAL_PP, batch_size=8, cache_raw=True)
    a = [np.asarray(b["image"]) for b in make_iter()]
    b = [np.asarray(b["image"]) for b in make_iter()]
  finally:
    ds_core.get = ds_core_get
  assert reads["n"] == 1, reads
  for x, y in zip(a, b):
    np.testing.assert_allclose(x, y)


def test_eval_input_pipeline_cache_levels():
  from big_vision_tpu.evaluators import common as ec
  import jax
  import pytest

  data = dict(name="synthetic", n=9, num_classes=10, h=24, w=24)
  kw = dict(pp_fn=EVAL_PP, batch_size=8, devices=jax.devices())
  g1, s1 = ec.eval_input_pipeline(data=data, cache="raw_data", **kw)
  g2, s2 = ec.eval_input_pipeline(data=data, cache="raw_data", **kw)
  assert g1 is g2 and s1 == s2  # memoized pipeline
  g3, _ = ec.eval_input_pipeline(data=data, cache="none", **kw)
  assert g3 is not g1  # "none" bypasses the cache
  with pytest.raises(AssertionError):
    ec.eval_input_pipeline(data=data, cache="bogus", **kw)


def test_jsonl_source(tmp_path):
  import json
  fname = tmp_path / "d.jsonl"
  with open(fname, "w") as f:
    for i in range(5):
      f.write(json.dumps({"text": f"hello {i}", "label": i}) + "\n")
  src = ds_core.get("jsonl", fname=str(fname))
  assert src.total_examples == 5
  exs = list(src.get_examples(ordered=True))
  assert exs[2]["text"] == "hello 2"
  assert exs[2]["_id"] == 2


def test_arrays_source_shuffles_differently_per_epoch():
  src = ds_core.get("arrays", data={"x": np.arange(100)})
  e0 = [e["x"] for e in src.get_examples(ordered=False, seed=1, epoch=0)]
  e1 = [e["x"] for e in src.get_examples(ordered=False, seed=1, epoch=1)]
  assert sorted(e0) == sorted(e1) == list(range(100))
  assert e0 != e1


def test_keep_on_cpu_strings():
  data = {"image": [np.zeros((16, 16, 3), np.uint8)] * 8,
          "text": [f"t{i}" for i in range(8)],
          "label": list(range(8))}
  cfg = dict(data=dict(name="arrays", data=data), batch_size=8,
             pp="value_range(-1,1)|keep('image','label')",
             shuffle_buffer_size=8, prefetch=0)
  it, _ = ip.training(cfg, seed=0)
  batch = next(it)
  # Strings never hit the device; they ride along as object arrays.
  assert batch["text"].dtype == object
  assert isinstance(batch["image"], jax.Array)


def test_skip_examples_sample_exact():
  """Resume seek: skipping N examples reproduces the unskipped stream's
  later batches exactly — including host-pp randomness (inception crop)
  and device-pp randomness (flip_lr), whose rngs are keyed by absolute
  stream/step position."""
  cfg = dict(
      data=dict(name="synthetic", n=128, num_classes=10, h=48, w=56,
                unique_images=16),
      batch_size=16, shuffle_buffer_size=32, num_threads=4, prefetch=0,
      pp=("decode_jpeg_and_inception_crop_yuv(32)|yuv420_to_rgb|flip_lr"
          "|value_range(-1, 1)|keep('image', 'label')"))

  it_a, _ = ip.training(cfg, seed=3)
  a = [np.asarray(next(it_a)["image"]) for _ in range(5)]

  it_b, _ = ip.training(cfg, seed=3, skip_examples=2 * 16)
  b = [np.asarray(next(it_b)["image"]) for _ in range(3)]

  for x, y in zip(a[2:], b):
    np.testing.assert_array_equal(x, y)


def test_skip_examples_sample_exact_mixture():
  """Mixture seek: the choice rng is replayed so each sub-stream advances
  by exactly what the interrupted run consumed from it."""
  sub = dict(name="synthetic", n=64, num_classes=10, h=48, w=56,
             unique_images=8)
  cfg = dict(
      data=[(1.0, dict(sub)), (2.0, dict(sub, n=48))],
      batch_size=8, shuffle_buffer_size=16, num_threads=2, prefetch=0,
      pp=("decode_jpeg_and_inception_crop_yuv(32)|yuv420_to_rgb"
          "|value_range(-1, 1)|keep('image', 'label')"))

  it_a, _ = ip.training(cfg, seed=5)
  a = [np.asarray(next(it_a)["image"]) for _ in range(6)]

  it_b, _ = ip.training(cfg, seed=5, skip_examples=3 * 8)
  b = [np.asarray(next(it_b)["image"]) for _ in range(3)]

  for x, y in zip(a[3:], b):
    np.testing.assert_array_equal(x, y)
