"""RSVQA (remote-sensing VQA) evaluator: per-question-type accuracies.

Behavior parity: reference evaluators/proj/paligemma/transfers/rsvqa.py.
Reports overall accuracy (OA = acc_any), average accuracy over question
types (AA = acc_avg), and the "nonum" subset averages used by the
RSVQA-LR/HR protocols.
"""

from __future__ import annotations

import big_vision_tpu.evaluators.common as c
from big_vision_tpu.evaluators.proj.paligemma.transfers import driver
from big_vision_tpu.evaluators.proj.paligemma.transfers.vqa import (
    score_against_gts)

API = "jit"

QUESTION_TYPES = ("comp", "count", "presence", "rural_urban", "area")

# Question-type subsets whose average is reported as acc_avg_{name}:
# the LR protocol excludes count+area, the HR protocol also rural_urban.
ACC_SUBSETS = (
    ("nonum", ("comp", "presence", "rural_urban")),  # rsvqa_lr
    ("nonum", ("comp", "presence")),  # rsvqa_hr
)


class Evaluator(driver.DecodeScorer):
  """VQA scoring plus per-question-type breakdown (OA/AA/subsets)."""

  CPU_KEYS = frozenset({"answers", "answer", "question_id",
                        "question_type"})

  def run(self, train_state):
    em = em_any = anls = 0.0
    scored = 0
    by_type_sum = dict.fromkeys(QUESTION_TYPES, 0.0)
    by_type_num = dict.fromkeys(QUESTION_TYPES, 0)
    records = []

    for answer, ex in self.examples(train_state):
      rec = {"question_id": ex.id(), "answer": answer}
      if (scores := score_against_gts(answer, ex, self.norm)) is not None:
        gts, hit, hit_any, sim = scores
        em += hit
        em_any += hit_any
        anls += sim
        scored += 1
        rec["gts"] = gts
        # Only the multi-GT (test) splits carry question_type labels.
        if "answers" in ex and len(ex["answers"]):
          qtype = ex.text("question_type")
          by_type_sum[qtype] += hit_any
          by_type_num[qtype] += 1
      records.append(rec)

    em, em_any, anls, scored, total = c.process_sum(
        [em, em_any, anls, scored, len(records)])
    by_type_sum, by_type_num = c.process_sum([by_type_sum, by_type_num])

    if scored:
      yield "acc", em / scored
      yield "acc_any", em_any / scored  # Overall Accuracy (OA).
      yield "anls", anls / scored
      type_accs = {t: by_type_sum[t] / n
                   for t, n in by_type_num.items() if n}
      for qtype, acc in type_accs.items():
        yield f"acc_{qtype}", acc
      if type_accs:
        yield "acc_avg", sum(type_accs.values()) / len(type_accs)  # AA.
      for name, subset in ACC_SUBSETS:
        if all(t in type_accs for t in subset):
          yield (f"acc_avg_{name}",
                 sum(type_accs[t] for t in subset) / len(subset))
    yield "num", total
    self.write_json(records)
