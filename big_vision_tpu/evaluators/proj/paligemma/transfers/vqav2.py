"""VQAv2 evaluator: official leave-one-out VQA score, split by answer type.

Behavior parity: reference evaluators/proj/paligemma/transfers/vqav2.py.
The answer normalization (punctuation, articles, contractions, number
words) is the official VQA evaluation procedure
(https://visualqa.org/evaluation.html, github.com/GT-Vision-Lab/VQA); the
REPLACEMENTS/PUNCT/ARTICLES tables are that public standard's data,
reproduced for metric parity — including the digit-comma quirk and the
"skip normalization when all annotators agree" OCR workaround.
"""

from __future__ import annotations

import json
import os
import re

import numpy as np

import big_vision_tpu.evaluators.common as c
from big_vision_tpu.evaluators.proj.paligemma.transfers import driver

API = "jit"

ANSWER_TYPES = ("yes/no", "number", "other")


def _clean(txt):
  return txt.replace("\n", " ").replace("\t", " ").strip()


# Kept under the reference's public name; some tools import it.
stripspace_vqav2 = _clean


def _loo_score(prediction, annotations):
  """Official accuracy: mean over ten leave-one-annotator-out subsets.

  Within each subset of 9 annotators the answer scores min(#agree/3, 1);
  i.e. full credit as soon as three of the held-in annotators agree.
  """
  agree = prediction == np.asarray(annotations)
  subsets = [np.delete(agree, leave_out) for leave_out in range(10)]
  return float(np.mean([min(s.sum() / 3.0, 1.0) for s in subsets]))


class Evaluator(driver.DecodeScorer):
  """Leave-one-out VQA accuracy over 10 annotator answers."""

  CPU_KEYS = frozenset(
      {"answers", "answer_type", "question_type", "question_id"})

  def run(self, train_state):
    score_sums = dict.fromkeys(ANSWER_TYPES, 0.0)
    score_counts = dict.fromkeys(ANSWER_TYPES, 0)
    records = []

    for answer, ex in self.examples(train_state):
      rec = {"question_id": ex.id(), "answer": answer}
      annotations = ex["answers"]
      if len(annotations):
        annotations = [_clean(driver.text_of(a)) for a in annotations]
        answer = _clean(answer)
        # The official code skips normalization when every annotator
        # agrees (avoids mangling OCR answers: GT-Vision-Lab/VQA#14).
        if len(set(annotations)) > 1:
          answer = postprocess_vqav2_text(answer)
          annotations = [postprocess_vqav2_text(a) for a in annotations]
        score_sums[ex.text("answer_type")] += _loo_score(answer, annotations)
        score_counts[ex.text("answer_type")] += 1
        rec.update(answer_raw=rec["answer"], answer=answer, gts=annotations)
      records.append(rec)

    score_sums = c.process_sum(score_sums)
    score_counts = c.process_sum(score_counts)
    total = c.process_sum(len(records))

    if n := sum(score_counts.values()):
      yield "acc", sum(score_sums.values()) / n
    for atype in ANSWER_TYPES:
      if n := score_counts[atype]:
        short = atype.replace("/", "")  # "yes/no" logs as "yesno"
        yield f"acc/{short}", score_sums[atype] / n
        yield f"num/{short}", n
    yield "num", total
    self.write_json(records)


def postprocess_vqav2_text(txt):
  """Official VQA answer normalization (see module docstring)."""
  guard_commas = re.search(r"(\d)(\,)(\d)", txt) is not None

  out = txt
  for p in PUNCT:
    # Delete punctuation attached to a space (or any comma inside a
    # number, per the official code's digit-comma condition); otherwise
    # replace it with a space.
    out = out.replace(p, "" if guard_commas or f"{p} " in txt
                      or f" {p}" in txt else " ")

  # Strip full stops that are not decimal points.
  out = re.sub(r"(?!<=\d)(\.)(?!\d)", "", out, flags=re.UNICODE)

  kept = (REPLACEMENTS.get(w, w) for w in out.lower().split()
          if w not in ARTICLES)
  return " ".join(kept)


# Public normalization tables from the official VQA evaluation code
# (contractions + number words, punctuation list, articles). Stored as
# data, not code: vqa_norm_tables.json next to this file.
_TABLES = json.load(open(
    os.path.join(os.path.dirname(__file__), "vqa_norm_tables.json")))
REPLACEMENTS = _TABLES["REPLACEMENTS"]
PUNCT = _TABLES["PUNCT"]
ARTICLES = frozenset(_TABLES["ARTICLES"])
