"""PaliGemma transfer evaluators: metrics math + end-to-end over a stub."""

import numpy as np
import pytest

import big_vision_tpu.pp.tokenizer as bvt_tok
from big_vision_tpu.evaluators.proj.paligemma.transfers import (
    chartqa, textmetrics, vqav2)


# ---------------------------------------------------------------------------
# Pure metric math.
# ---------------------------------------------------------------------------


def test_levenshtein_and_anls():
  assert textmetrics.levenshtein("kitten", "sitting") == 3
  assert textmetrics.levenshtein("", "abc") == 3
  assert textmetrics.anls_metric("abc", "abc") == 1
  assert textmetrics.anls_metric("abc", "abd") == pytest.approx(2 / 3)
  # Below threshold -> 0.
  assert textmetrics.anls_metric("abc", "xyz") == 0
  assert textmetrics.anls_metric("", "") == 1.0


def test_caption_metrics_perfect_match():
  toks = textmetrics.ptb_lite_tokenize
  gts = {0: [toks("a cat sits on the mat")],
         1: [toks("two dogs play in the park")]}
  res = {0: [toks("a cat sits on the mat")],
         1: [toks("two dogs play in the park")]}
  assert textmetrics.bleu4(gts, res) == pytest.approx(1.0)
  assert textmetrics.rouge_l(gts, res) == pytest.approx(1.0)
  assert textmetrics.cider_d(gts, res) == pytest.approx(10.0, abs=1e-6)


def test_caption_metrics_ranking():
  toks = textmetrics.ptb_lite_tokenize
  # Needs >=2 corpus images: idf is degenerate (log 1 = 0) on one image.
  gts = {0: [toks("a cat sits on the mat"), toks("a cat on a mat")],
         1: [toks("green trains arrive early")]}
  good = {0: [toks("a cat sits on a mat")],
          1: [toks("green trains arrive early")]}
  bad = {0: [toks("bright orange submarine flies")],
         1: [toks("green trains arrive early")]}
  assert textmetrics.cider_d(gts, good) > textmetrics.cider_d(gts, bad)
  assert textmetrics.bleu4(gts, good) > textmetrics.bleu4(gts, bad)
  assert textmetrics.rouge_l(gts, good) > textmetrics.rouge_l(gts, bad)


def test_vqav2_postprocessing():
  assert vqav2.postprocess_vqav2_text("The Dog!") == "dog"
  assert vqav2.postprocess_vqav2_text("two") == "2"
  assert vqav2.postprocess_vqav2_text("isnt it") == "isn't it"
  assert vqav2.stripspace_vqav2(" a\nb\tc ") == "a b c"


def test_chartqa_relaxed_match():
  assert chartqa.relaxed_match("100", "104")  # 4% off
  assert not chartqa.relaxed_match("100", "106")  # 6% off
  assert chartqa.relaxed_match("20%", "0.21")  # percent normalization
  assert chartqa.relaxed_match("cat", "cat")
  assert not chartqa.relaxed_match("cat", "dog")
  assert not chartqa.relaxed_match("0", "0.01")  # gt 0 -> exact only


# ---------------------------------------------------------------------------
# End-to-end over an in-memory dataset with a stub decode + tokenizer.
# ---------------------------------------------------------------------------


class _StubTok:
  """Token id -> word lookup; eos=1 stops."""
  VOCAB = {2: "yes", 3: "no", 4: "2", 5: "blue", 6: "cat",
           7: "sits", 8: "here"}
  eos_token = 1

  def to_str(self, tokens, *, stop_at_eos=True):
    words = []
    for t in np.asarray(tokens).reshape(-1):
      if stop_at_eos and t == 1:
        break
      if int(t) in self.VOCAB:
        words.append(self.VOCAB[int(t)])
    return " ".join(words)

  def to_int(self, text, *, bos=False, eos=False):
    inv = {v: k for k, v in self.VOCAB.items()}
    return [inv[w] for w in text.split()]


def _eval_kw(data, batch_size=8):  # Divisible by the 8-device CPU mesh.
  import jax
  return dict(
      data=dict(name="arrays", data=data),
      pp_fn="", batch_size=batch_size, devices=jax.devices())


def test_vqa_evaluator_end_to_end(monkeypatch):
  import jax.numpy as jnp
  from big_vision_tpu.evaluators.proj.paligemma.transfers import vqa
  monkeypatch.setattr(bvt_tok, "get_tokenizer", lambda spec: _StubTok())

  # 3 questions; model will answer "yes", "no", "yes" (ids 2/3/2).
  data = {
      "image": [np.zeros((2, 2, 3), np.float32)] * 3,
      "question_id": np.asarray([10, 11, 12]),
      "answer": ["yes", "yes", "blue"],
  }

  def fake_decode(train_state, batch):
    b = batch["image"].shape[0]
    toks = np.ones((b, 3), np.int32)
    plan = [2, 3, 2]  # yes, no, yes(wrong vs blue); rest eos-only padding
    toks[:len(plan), 0] = plan
    return jnp.asarray(toks)

  ev = vqa.Evaluator(fake_decode, tokenizer="stub", **_eval_kw(data))
  metrics = dict(ev.run(None))
  assert metrics["num"] == 3
  assert metrics["acc"] == pytest.approx(1 / 3)
  assert metrics["acc_any"] == pytest.approx(1 / 3)


def test_tallyqa_evaluator_end_to_end(monkeypatch):
  import jax.numpy as jnp
  from big_vision_tpu.evaluators.proj.paligemma.transfers import tallyqa
  monkeypatch.setattr(bvt_tok, "get_tokenizer", lambda spec: _StubTok())

  data = {
      "image": [np.zeros((2, 2, 3), np.float32)] * 4,
      "answer": ["2", "2", "2", "2"],
      "issimple": np.asarray([1, 1, 0, -1]),
  }

  def fake_decode(train_state, batch):
    b = batch["image"].shape[0]
    toks = np.ones((b, 2), np.int32)
    plan = [4, 4, 2, 4]  # "2", "2", "yes"(wrong), "2"
    toks[:len(plan), 0] = plan
    return jnp.asarray(toks)

  ev = tallyqa.Evaluator(fake_decode, tokenizer="stub", **_eval_kw(data))
  metrics = dict(ev.run(None))
  assert metrics["num"] == 4
  assert metrics["acc"] == pytest.approx(3 / 4)
  assert metrics["acc/simple"] == pytest.approx(1.0)
  assert metrics["acc/complex"] == pytest.approx(0.0)
  assert metrics["num/count_2"] == 4


def test_pope_evaluator_end_to_end(monkeypatch):
  import jax.numpy as jnp
  from big_vision_tpu.evaluators.proj.paligemma.transfers import pope
  monkeypatch.setattr(bvt_tok, "get_tokenizer", lambda spec: _StubTok())

  data = {
      "image": [np.zeros((2, 2, 3), np.float32)] * 3,
      "question_id": np.asarray([0, 1, 2]),
      "answer": ["yes", "no", "no"],
  }

  def fake_decode(train_state, batch):
    b = batch["image"].shape[0]
    toks = np.ones((b, 2), np.int32)
    plan = [2, 3, 5]  # yes, no, "blue" (invalid)
    toks[:len(plan), 0] = plan
    return jnp.asarray(toks)

  ev = pope.Evaluator(fake_decode, tokenizer="stub", **_eval_kw(data))
  metrics = dict(ev.run(None))
  assert metrics["acc"] == pytest.approx(2 / 3)
  assert metrics["valid_percent"] == pytest.approx(2 / 3)


def test_coco_caption_evaluator_end_to_end(monkeypatch):
  import jax.numpy as jnp
  from big_vision_tpu.evaluators.proj.paligemma.transfers import (
      coco_caption)
  monkeypatch.setattr(bvt_tok, "get_tokenizer", lambda spec: _StubTok())

  data = {
      "image": [np.zeros((2, 2, 3), np.float32)] * 2,
      "image/id": np.asarray([7, 8]),
      # >=4 words so 3/4-gram CIDEr terms are non-degenerate.
      "captions": [np.asarray(["blue cat sits here"] * 2),
                   np.asarray(["no cat sits here"] * 2)],
  }

  def fake_decode(train_state, batch):
    b = batch["image"].shape[0]
    toks = np.ones((b, 5), np.int32)
    toks[0, :4] = [5, 6, 7, 8]  # "blue cat sits here" - exact match
    toks[1, :4] = [3, 6, 7, 8]  # "no cat sits here" - exact match
    return jnp.asarray(toks)

  ev = coco_caption.Evaluator(
      fake_decode, tokenizer="stub", metrics=("cider", "bleu-4", "rouge"),
      **_eval_kw(data))
  metrics = dict(ev.run(None))
  assert metrics["cider"] == pytest.approx(10.0, abs=1e-5)
  assert metrics["rouge"] == pytest.approx(1.0)


def test_porter_stemmer():
  from big_vision_tpu.evaluators.proj.paligemma.transfers import (
      textmetrics as tm)
  for word, stem in [("caresses", "caress"), ("ponies", "poni"),
                     ("cats", "cat"), ("feed", "feed"),
                     ("agreed", "agre"), ("plastered", "plaster"),
                     ("motoring", "motor"), ("sing", "sing"),
                     ("conflated", "conflat"), ("hopping", "hop"),
                     ("happy", "happi"), ("relational", "relat"),
                     ("conditional", "condit"), ("rational", "ration"),
                     ("probate", "probat"), ("cease", "ceas")]:
    assert tm.porter_stem(word) == stem, (word, tm.porter_stem(word))


def test_meteor_scores():
  from big_vision_tpu.evaluators.proj.paligemma.transfers import (
      textmetrics as tm)
  toks = tm.ptb_lite_tokenize
  # Identical sentence -> near 1 (tiny fragmentation penalty only).
  gts = {0: [toks("the cat sat on the mat")]}
  res = {0: [toks("the cat sat on the mat")]}
  assert tm.meteor(gts, res) > 0.98
  # Stem-level match still scores (exact would miss "sitting"/"sat").
  res_stem = {0: [toks("the cats sitting on the mats")]}
  gts_stem = {0: [toks("the cat sits on the mat")]}
  s = tm.meteor(gts_stem, res_stem)
  assert 0.2 < s < 1.0, s
  # Disjoint caption -> 0; word salad scores below ordered caption.
  assert tm.meteor({0: [toks("green trains arrive")]},
                   {0: [toks("purple elephant dances")]}) == 0.0
  ordered = tm.meteor({0: [toks("a big dog runs fast")]},
                      {0: [toks("a big dog runs fast")]})
  shuffled = tm.meteor({0: [toks("a big dog runs fast")]},
                       {0: [toks("fast runs dog big a")]})
  assert ordered > shuffled > 0
