"""Golden-value and independent-implementation checks for textmetrics.

pycocoevalcap (the reference scorer stack) is not installable in this
image, so the native CIDEr-D/BLEU-4/ROUGE-L/METEOR are validated two
ways that don't depend on it:

1. Analytic goldens: fixtures whose scores follow in closed form from the
   published formulas (exact match, brevity penalty, known LCS overlap).
2. Independent reimplementations: CIDEr-D and corpus BLEU transcribed
   directly from the pycocoevalcap algorithms (cider_scorer.py /
   bleu_scorer.py semantics) in this test file, structured differently
   from the library code, cross-checked on randomized corpora to 1e-9.
   A scoring bug in either implementation breaks the agreement.
"""

import collections
import math

import numpy as np
import pytest

from big_vision_tpu.evaluators.proj.paligemma.transfers import textmetrics as tm


def T(*sents):
  return [s.split() for s in sents]


# ---------------------------------------------------------------------------
# Analytic goldens
# ---------------------------------------------------------------------------

class TestAnalyticGoldens:

  def test_bleu4_exact_match_is_one(self):
    gts = {0: T("a b c d e")}
    res = {0: T("a b c d e")}
    assert tm.bleu4(gts, res) == pytest.approx(1.0)

  def test_bleu4_brevity_penalty(self):
    # All precisions 1, hyp 4 tokens vs ref 5: BP = exp(1 - 5/4).
    gts = {0: T("a b c d e")}
    res = {0: T("a b c d")}
    assert tm.bleu4(gts, res) == pytest.approx(math.exp(1 - 5 / 4))

  def test_bleu4_closest_ref_length(self):
    # Two refs, lengths 4 and 7; hyp length 5 -> closest is 4 -> BP = 1.
    gts = {0: [["a", "b", "c", "d"], ["a", "b", "c", "d", "e", "f", "g"]]}
    res = {0: T("a b c d e")}
    # p1=5/5? "e" appears in ref2 -> 5/5; p2: hyp bigrams ab,bc,cd,de all
    # in refs -> 1; p3, p4 likewise via ref2 -> BLEU = 1.
    assert tm.bleu4(gts, res) == pytest.approx(1.0)

  def test_rouge_l_golden(self):
    # LCS("a b c d", "a c d e") = "a c d" = 3; P = R = 3/4 -> F = 0.75.
    gts = {0: T("a c d e")}
    res = {0: T("a b c d")}
    assert tm.rouge_l(gts, res) == pytest.approx(0.75)

  def test_rouge_l_max_over_refs(self):
    gts = {0: T("x y z", "a b c d")}
    res = {0: T("a b c d")}
    assert tm.rouge_l(gts, res) == pytest.approx(1.0)

  def test_meteor_exact_match(self):
    # Banerjee & Lavie: P=R=1 -> Fmean=1; one chunk over m=5 matches ->
    # penalty = 0.5 * (1/5)^3; score = 1 - 0.5/125.
    gts = {0: T("the cat sat on mat")}
    res = {0: T("the cat sat on mat")}
    assert tm.meteor(gts, res) == pytest.approx(1 - 0.5 * (1 / 5) ** 3)

  def test_meteor_recall_weighted(self):
    # hyp "the cat" vs ref "the cat sat": P=1, R=2/3, alpha=0.9:
    # Fmean = P*R/(alpha*P + (1-alpha)*R) = (2/3)/(0.9 + 0.1*2/3)
    # chunks=1, matches=2 -> penalty = 0.5*(1/2)^3 = 1/16.
    gts = {0: T("the cat sat")}
    res = {0: T("the cat")}
    fmean = (2 / 3) / (0.9 + 0.1 * 2 / 3)
    assert tm.meteor(gts, res) == pytest.approx(fmean * (1 - 0.0625))

  def test_cider_exact_match_corpus_is_ten(self):
    # Identical hyp/ref per image, distinct across images: cosine 1 per n,
    # zero length delta -> score = 10 exactly.
    gts = {0: T("a b c d e"), 1: T("f g h i j")}
    res = {0: T("a b c d e"), 1: T("f g h i j")}
    assert tm.cider_d(gts, res) == pytest.approx(10.0)

  def test_anls_golden(self):
    # edit distance 1 over max-length 5 -> 1 - 0.2 = 0.8 >= theta.
    assert tm.anls_metric("hello", "hellA") == pytest.approx(0.8)
    # similarity below theta collapses to 0.
    assert tm.anls_metric("hello", "zzzzz") == 0.0


# ---------------------------------------------------------------------------
# Independent reimplementations (pycocoevalcap semantics)
# ---------------------------------------------------------------------------

def _cider_reference(gts, res, n_max=4, sigma=6.0):
  """Direct transcription of pycocoevalcap cider_scorer.py."""

  def precook(words, n):
    counts = collections.defaultdict(int)
    for k in range(1, n + 1):
      for i in range(len(words) - k + 1):
        counts[tuple(words[i:i + k])] += 1
    return counts

  crefs = [[precook(r, n_max) for r in gts[iid]] for iid in res]
  ctest = [precook(res[iid][0], n_max) for iid in res]

  doc_freq = collections.defaultdict(float)
  for refs in crefs:
    for ngram in set(ng for ref in refs for ng in ref):
      doc_freq[ngram] += 1
  ref_len = math.log(float(len(crefs)))

  def counts2vec(cnts):
    vec = [collections.defaultdict(float) for _ in range(n_max)]
    length = 0
    norm = [0.0] * n_max
    for ngram, term_freq in cnts.items():
      df = math.log(max(1.0, doc_freq[ngram]))
      n = len(ngram) - 1
      vec[n][ngram] = float(term_freq) * (ref_len - df)
      norm[n] += vec[n][ngram] ** 2
      if n == 0:
        length += term_freq
    return vec, [math.sqrt(x) for x in norm], length

  def sim(vh, nh, lh, vr, nr, lr):
    delta = float(lh - lr)
    val = [0.0] * n_max
    for n in range(n_max):
      for ngram, w in vh[n].items():
        val[n] += min(w, vr[n][ngram]) * vr[n][ngram]
      if nh[n] and nr[n]:
        val[n] /= nh[n] * nr[n]
      val[n] *= math.e ** (-(delta ** 2) / (2 * sigma ** 2))
    return val

  scores = []
  for test, refs in zip(ctest, crefs):
    vh, nh, lh = counts2vec(test)
    score = np.zeros(n_max)
    for ref in refs:
      vr, nr, lr = counts2vec(ref)
      score += np.array(sim(vh, nh, lh, vr, nr, lr))
    score_avg = np.mean(score) / len(refs) * 10.0
    scores.append(score_avg)
  return float(np.mean(scores))


def _bleu_reference(gts, res):
  """Corpus BLEU-4 with closest-ref brevity (bleu_scorer.py semantics)."""
  correct = [0] * 4
  total = [0] * 4
  hyp_len = ref_len = 0
  for iid in res:
    hyp = res[iid][0]
    hyp_len += len(hyp)
    lens = [len(r) for r in gts[iid]]
    ref_len += min(lens, key=lambda l: (abs(l - len(hyp)), l))
    for n in range(4):
      hcnt = collections.Counter(
          tuple(hyp[i:i + n + 1]) for i in range(len(hyp) - n))
      rmax = collections.Counter()
      for r in gts[iid]:
        rcnt = collections.Counter(
            tuple(r[i:i + n + 1]) for i in range(len(r) - n))
        for g, c in rcnt.items():
          rmax[g] = max(rmax[g], c)
      for g, c in hcnt.items():
        correct[n] += min(c, rmax[g])
      total[n] += sum(hcnt.values())
  logp = 0.0
  for n in range(4):
    if not correct[n]:
      return 0.0
    logp += math.log(correct[n] / total[n]) / 4
  bp = 1.0 if hyp_len > ref_len else math.exp(1 - ref_len / hyp_len)
  return bp * math.exp(logp)


def _random_corpus(seed, n_imgs=12, vocab=14, nrefs=3):
  rng = np.random.default_rng(seed)
  words = [f"w{i}" for i in range(vocab)]
  gts, res = {}, {}
  for i in range(n_imgs):
    gts[i] = [list(rng.choice(words, rng.integers(4, 9)))
              for _ in range(nrefs)]
    base = gts[i][0]
    hyp = [w if rng.random() > 0.3 else str(rng.choice(words))
           for w in base]
    res[i] = [hyp]
  return gts, res


class TestIndependentAgreement:

  @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
  def test_cider_matches_pycoco_transcription(self, seed):
    gts, res = _random_corpus(seed)
    assert tm.cider_d(gts, res) == pytest.approx(
        _cider_reference(gts, res), abs=1e-9)

  @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
  def test_bleu_matches_pycoco_transcription(self, seed):
    gts, res = _random_corpus(seed)
    assert tm.bleu4(gts, res) == pytest.approx(
        _bleu_reference(gts, res), abs=1e-9)
