"""GIVT/UVIM/cappa evaluators: PQ math, depth metrics, PSNR, FID, saves."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _eval_kw(data, batch_size=8):
  return dict(data=dict(name="arrays", data=data), pp_fn="",
              batch_size=batch_size, devices=jax.devices())


def test_pq_perfect_and_split():
  from big_vision_tpu.evaluators.proj.givt import coco_panoptic as pq
  import collections
  # GT: left half cat 1 inst 1, right half cat 2 inst 1.
  gt = np.zeros((8, 8, 2), np.int32)
  gt[:, :4] = [1, 1]
  gt[:, 4:] = [2, 1]

  stats = collections.defaultdict(
      lambda: {"iou": 0.0, "tp": 0, "fp": 0, "fn": 0})
  pq.accumulate_pq_stats(gt, gt.copy(), stats)
  assert stats[1] == {"iou": 1.0, "tp": 1, "fp": 0, "fn": 0}
  assert stats[2] == {"iou": 1.0, "tp": 1, "fp": 0, "fn": 0}

  # Prediction misses cat 2 (labels it void) and over-segments cat 1.
  pred = np.zeros((8, 8, 2), np.int32)
  pred[:, :2] = [1, 1]
  pred[:, 2:4] = [1, 2]
  stats2 = collections.defaultdict(
      lambda: {"iou": 0.0, "tp": 0, "fp": 0, "fn": 0})
  pq.accumulate_pq_stats(gt, pred, stats2)
  # Neither cat-1 fragment reaches IoU>0.5 -> fn for gt, 2 fps.
  assert stats2[1]["tp"] == 0 and stats2[1]["fn"] == 1
  assert stats2[1]["fp"] == 2
  assert stats2[2]["fn"] == 1 and stats2[2]["fp"] == 0


def test_panoptic_evaluator_end_to_end():
  from big_vision_tpu.evaluators.proj.givt import coco_panoptic
  gt = np.zeros((4, 8, 8, 2), np.int32)
  gt[:, :, :4] = [1, 1]
  gt[:, :, 4:] = [2, 1]
  data = {"image": [np.zeros((8, 8, 3), np.float32)] * 4,
          "ground_truth": list(gt)}

  def predict_fn(train_state, batch):
    g = batch["ground_truth"]
    return {"semantics": g[..., 0], "instances": g[..., 1]}

  ev = coco_panoptic.Evaluator(predict_fn, **_eval_kw(data))
  metrics = dict(ev.run(None))
  assert metrics["PQ"] == pytest.approx(100.0)
  assert metrics["SQ"] == pytest.approx(100.0)
  assert metrics["RQ"] == pytest.approx(100.0)
  assert metrics["num_categories"] == 2


def test_nyu_depth_evaluator():
  from big_vision_tpu.evaluators.proj.givt import nyu_depth
  rs = np.random.RandomState(0)
  gt = rs.uniform(1.0, 9.0, (3, 6, 6, 1)).astype(np.float32)
  data = {"image": [np.zeros((6, 6, 3), np.float32)] * 3,
          "ground_truth": list(gt)}

  def perfect(train_state, batch):
    return {"depth": batch["ground_truth"][..., 0]}

  ev = nyu_depth.Evaluator(perfect, **_eval_kw(data))
  metrics = dict(ev.run(None))
  assert metrics["RMSE"] == pytest.approx(0.0, abs=1e-6)
  assert metrics["delta1"] == pytest.approx(1.0)

  def off_by_10pct(train_state, batch):
    return {"depth": batch["ground_truth"][..., 0] * 1.1}

  ev2 = nyu_depth.Evaluator(off_by_10pct, **_eval_kw(data))
  m2 = dict(ev2.run(None))
  assert m2["abs_RE"] == pytest.approx(0.1, abs=1e-5)
  assert m2["delta1"] == pytest.approx(1.0)  # 1.1 < 1.25


def test_psnr_evaluator():
  from big_vision_tpu.evaluators.proj.uvim import psnr
  rs = np.random.RandomState(0)
  imgs = rs.uniform(-1, 1, (3, 4, 4, 3)).astype(np.float32)
  data = {"image": list(imgs), "labels": list(imgs)}

  def noisy(train_state, batch):
    return {"pred": batch["labels"] + 0.1}

  ev = psnr.Evaluator(noisy, **_eval_kw(data))
  m = dict(ev.run(None))
  # MSE = 0.01, range 2 -> PSNR = 20log10(2) - 10log10(0.01) = 26.02.
  assert m["PSNR"] == pytest.approx(26.02, abs=0.01)


def test_fid_math():
  from big_vision_tpu.evaluators.proj.uvim import coltran_fid as fid
  rs = np.random.RandomState(0)
  x = rs.randn(2000, 8)
  mu, sigma = fid.gaussian_stats(x)
  assert fid.frechet_distance(mu, sigma, mu, sigma) == pytest.approx(
      0.0, abs=1e-6)
  # Shifting the mean by d adds ||d||^2.
  d = np.full(8, 0.5)
  got = fid.frechet_distance(mu + d, sigma, mu, sigma)
  assert got == pytest.approx(float(d @ d), abs=1e-6)


def test_save_predictions_evaluator(tmp_path, monkeypatch):
  from big_vision_tpu.evaluators.proj.givt import save_predictions
  import big_vision_tpu.evaluators.common as c
  monkeypatch.setattr(
      c, "resolve_outfile",
      lambda outfile, **kw: str(tmp_path / "preds.npz"))

  data = {"image": [np.full((2, 2, 3), i, np.float32) for i in range(3)]}

  def predict_fn(train_state, batch):
    return {"mean": jnp.mean(batch["image"], axis=(1, 2, 3))}

  ev = save_predictions.Evaluator(predict_fn, outfile="preds.npz",
                                  **_eval_kw(data))
  m = dict(ev.run(None))
  assert m["num_examples"] == 3
  saved = np.load(tmp_path / "preds.npz")
  assert sorted(np.asarray(saved["outputs/mean"])) == [0.0, 1.0, 2.0]


def test_image_text_retrieval_math():
  from big_vision_tpu.evaluators.proj.image_text import (
      image_text_retrieval)
  # 2 images, 4 texts; distances favor the correct pairs.
  dist = np.array([[0.1, 0.2, 0.9, 0.8],
                   [0.9, 0.8, 0.1, 0.2]])
  corr = [0, 0, 1, 1]
  t2i = image_text_retrieval.text_to_image_retrieval_eval(dist, corr)
  assert t2i["Recall@1"] == 1.0
  i2t = image_text_retrieval.image_to_text_retrieval_eval(dist, corr)
  assert i2t["Recall@1"] == 1.0
  # Swap one: text 0 closest to image 1.
  dist[1, 0] = 0.0
  t2i = image_text_retrieval.text_to_image_retrieval_eval(dist, corr)
  assert t2i["Recall@1"] == pytest.approx(3 / 4)


def test_cappa_scoring_classifier_end_to_end(monkeypatch):
  """Drives the score predict_fn + scoring_classifier evaluator together."""
  from big_vision_tpu.evaluators.proj.cappa import scoring_classifier
  from big_vision_tpu.models.proj.cappa import cappa
  from big_vision_tpu.trainers.proj.cappa import predict_fns

  model = cappa.Model(
      num_layers=1, num_heads=2, mlp_dim=16, emb_dim=16, vocab_size=32,
      seq_len=4, patches=(8, 8), posemb_type="learn")
  img = jnp.zeros((2, 16, 16, 3))
  txt = jnp.zeros((2, 4), jnp.int32)
  params = model.init(jax.random.PRNGKey(0), img, txt)["params"]
  fns = predict_fns.get_predict_fns(model)

  # Tokenized "class names": 3 classes, 4 tokens each.
  monkeypatch.setitem(
      scoring_classifier.CLASS_NAMES, "arrays", lambda: ["a", "b", "c"])
  monkeypatch.setattr(
      scoring_classifier, "get_classes",
      lambda name, pp: np.arange(12, dtype=np.int32).reshape(3, 4) % 5 + 1)

  data = {"image": np.random.RandomState(0).randn(4, 16, 16, 3)
          .astype(np.float32),
          "label": np.array([0, 1, 2, 0])}
  ev = scoring_classifier.Evaluator(
      fns["score"], "", data=dict(name="arrays", data=data), pp_fn="",
      batch_size=4, devices=jax.devices())
  results = dict(ev.run({"params": params}))
  assert 0.0 <= results["prec@1"] <= 1.0

  # Prompt path: make_prompt is cached and prefixes every caption.
  scores = fns["score"]({"params": params},
                        {"image": jnp.asarray(data["image"]),
                         "_label_tokens": jnp.ones((3, 4), jnp.int32)})
  assert scores.shape == (4, 3)
