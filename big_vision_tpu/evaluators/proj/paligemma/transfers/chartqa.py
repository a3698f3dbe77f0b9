"""ChartQA evaluator: exact match + relaxed (5% numeric tolerance) match.

Behavior parity: reference evaluators/proj/paligemma/transfers/chartqa.py.
Relaxed correctness per arXiv:2203.10244 §5.1: a numeric answer counts as
correct within 5% relative error of the numeric GT; everything else (and a
GT of exactly 0) requires exact string match.
"""

from __future__ import annotations

import big_vision_tpu.evaluators.common as c
from big_vision_tpu.evaluators.proj.paligemma.transfers import driver

API = "jit"

RELATIVE_TOLERANCE = 0.05


def _as_number(text):
  """Parses a float, handling trailing '%'; None if not numeric."""
  try:
    return (float(text[:-1]) / 100.0 if text.endswith("%")
            else float(text))
  except ValueError:
    return None


def relaxed_match(target, prediction, tol=RELATIVE_TOLERANCE):
  """5% relative tolerance for numbers; exact match otherwise (or gt==0)."""
  pred_num, gt_num = _as_number(prediction), _as_number(target)
  if pred_num is not None and gt_num:  # gt of 0 falls through to exact.
    return abs(pred_num - gt_num) / abs(gt_num) <= tol
  return prediction == target


class Evaluator(driver.DecodeScorer):
  """Exact + relaxed accuracy against a single GT answer."""

  CPU_KEYS = frozenset({"answer", "question_id"})

  def __init__(self, *args, out_question_key="question_id",
               out_answer_key="answer", **kw):
    super().__init__(*args, **kw)
    self.out_question_key = out_question_key
    self.out_answer_key = out_answer_key

  def run(self, train_state):
    exact = relaxed = 0.0
    count = 0
    records = []

    for answer, ex in self.examples(train_state):
      gt = self.norm(ex.text("answer"))
      hit = relaxed_match(gt, answer)
      exact += float(answer == gt)
      relaxed += hit
      count += 1
      records.append({self.out_question_key: ex.id(),
                      self.out_answer_key: answer,
                      "gt": gt, "relaxed_match": hit})

    exact, relaxed, count = c.process_sum([exact, relaxed, count])
    if count:
      yield "acc", exact / count
      yield "relaxed_acc", relaxed / count
    yield "num", count
    self.write_json(records)
