"""ScienceQA evaluator: multiple-choice accuracy via answer-letter parsing.

Behavior parity: reference evaluators/proj/paligemma/transfers/science_qa.py.
The model is expected to generate "The answer is X."; the letter is parsed
out (case-insensitive) and compared against the letter parsed from the GT;
unparseable generations score zero and are reported via `parsefail`.
"""

from __future__ import annotations

import re

import big_vision_tpu.evaluators.common as c
from big_vision_tpu.evaluators.proj.paligemma.transfers import driver

API = "jit"

FAILURE = "failed"
_LETTER = re.compile(r"the answer is ([a-z])\.")


def parse_choice(text):
  """'The answer is B.' -> 'b'; FAILURE when the pattern is absent."""
  found = _LETTER.match(text.lower())
  return found.group(1) if found else FAILURE


class Evaluator(driver.DecodeScorer):
  """Parses 'the answer is X.' and scores exact letter match."""

  CPU_KEYS = frozenset({"answer", "question_id"})

  def __init__(self, *args, out_question_key="question_id", **kw):
    super().__init__(*args, **kw)
    self.out_question_key = out_question_key

  # Kept as a method: the reference exposes postproc on the evaluator.
  def postproc(self, raw_answer):
    return parse_choice(raw_answer)

  def run(self, train_state):
    hits = fails = scored = 0
    records = []

    for raw, ex in self.examples(train_state):
      choice = self.postproc(raw)
      rec = {self.out_question_key: ex.id(),
             "raw_answer": raw, "answer": choice}
      if "answer" in ex:
        gt = self.postproc(ex.text("answer"))
        hits += choice == gt
        fails += choice == FAILURE
        scored += 1
        rec["gts"] = [gt]
      records.append(rec)

    hits, fails, scored, total = c.process_sum(
        [hits, fails, scored, len(records)])
    if scored > 0:
      yield "acc", hits / scored
      yield "parsefail", fails / scored
    yield "num", total
    self.write_json(records)
