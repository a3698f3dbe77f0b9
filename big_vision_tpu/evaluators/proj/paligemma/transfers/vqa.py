"""Simple-VQA evaluator (OCR-VQA, OKVQA, A-OKVQA): EM accuracy + ANLS.

Behavior parity: reference evaluators/proj/paligemma/transfers/vqa.py.
Batches carry `question_id` and either `answer` (single GT) or `answers`
(multi GT with the VQA-style min(matches/3, 1) credit). Decoding runs on
device; detokenization and scoring happen host-side over the local slice
and are reduced across processes as sufficient statistics.
"""

from __future__ import annotations

import big_vision_tpu.evaluators.common as c
from big_vision_tpu.evaluators.proj.paligemma.transfers import driver
from big_vision_tpu.evaluators.proj.paligemma.transfers.textmetrics import (
    anls_metric)

API = "jit"


def score_against_gts(answer, ex, norm):
  """Returns (gts, em, em_any, anls) for one example, or None if no GT.

  Single-GT fields score plain exact match; multi-GT fields use the VQA
  convention: full credit once 3 annotators agree, `em_any` if any does.
  """
  if "answer" in ex:
    gt = norm(ex.text("answer"))
    hit = float(answer == gt)
    return [gt], hit, hit, anls_metric(gt, answer)
  if "answers" in ex and len(ex["answers"]):
    gts = [norm(driver.text_of(a)) for a in ex["answers"]]
    hits = sum(answer == gt for gt in gts)
    return (gts, min(hits / 3.0, 1.0), min(float(hits), 1.0),
            max(anls_metric(gt, answer) for gt in gts))
  return None


class Evaluator(driver.DecodeScorer):
  """EM/any/ANLS scoring of decoded answers against one or many GTs."""

  CPU_KEYS = frozenset({"answers", "answer", "question_id"})

  def __init__(self, *args, out_question_key="question_id",
               out_answer_key="answer", **kw):
    super().__init__(*args, **kw)
    self.out_question_key = out_question_key
    self.out_answer_key = out_answer_key

  def run(self, train_state):
    em = em_any = anls = 0.0
    scored = 0
    records = []

    for answer, ex in self.examples(train_state):
      rec = {self.out_question_key: ex.id(),
             self.out_answer_key: answer}
      if (scores := score_against_gts(answer, ex, self.norm)) is not None:
        gts, hit, hit_any, sim = scores
        em += hit
        em_any += hit_any
        anls += sim
        scored += 1
        rec["gts"] = gts
      records.append(rec)

    em, em_any, anls, scored, total = c.process_sum(
        [em, em_any, anls, scored, len(records)])
    if scored:
      yield "acc", em / scored
      yield "acc_any", em_any / scored
      yield "anls", anls / scored
    yield "num", total
    self.write_json(records)
