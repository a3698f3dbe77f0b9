"""POPE (object-hallucination probing) evaluator: yes/no accuracy.

Behavior parity: reference evaluators/proj/paligemma/transfers/pope.py.
Answers are lowercased before comparison; the fraction of decoded answers
that are a literal "yes"/"no" is reported as valid_percent.
"""

from __future__ import annotations

import big_vision_tpu.evaluators.common as c
from big_vision_tpu.evaluators.proj.paligemma.transfers import driver

API = "jit"


class Evaluator(driver.DecodeScorer):
  """Yes/no accuracy + validity rate."""

  CPU_KEYS = frozenset({"answer", "question_id"})

  def __init__(self, *args, out_question_key="question_id",
               out_answer_key="answer", **kw):
    super().__init__(*args, **kw)
    self.out_question_key = out_question_key
    self.out_answer_key = out_answer_key

  def run(self, train_state):
    hits = wellformed = count = 0
    records = []

    for answer, ex in self.examples(train_state):
      answer = answer.lower()
      hits += answer == ex.text("answer")
      wellformed += answer in ("yes", "no")
      count += 1
      records.append({self.out_question_key: ex.id(),
                      self.out_answer_key: answer})

    hits, wellformed, count = c.process_sum([hits, wellformed, count])
    if count:
      yield "acc", hits / count
      yield "valid_percent", wellformed / count
    yield "num", count
    self.write_json(records)
