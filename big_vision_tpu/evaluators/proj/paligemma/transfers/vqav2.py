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


# Public normalization tables from the official VQA evaluation code.
# pylint: disable=line-too-long
REPLACEMENTS = {
    # CONTRACTIONS
    "aint": "ain't", "arent": "aren't", "cant": "can't", "couldve": "could've", "couldnt": "couldn't",
    "couldn'tve": "couldn't've", "couldnt've": "couldn't've", "didnt": "didn't", "doesnt": "doesn't", "dont": "don't", "hadnt": "hadn't",
    "hadnt've": "hadn't've", "hadn'tve": "hadn't've", "hasnt": "hasn't", "havent": "haven't", "hed": "he'd", "hed've": "he'd've",
    "he'dve": "he'd've", "hes": "he's", "howd": "how'd", "howll": "how'll", "hows": "how's", "Id've": "I'd've", "I'dve": "I'd've",
    "Im": "I'm", "Ive": "I've", "isnt": "isn't", "itd": "it'd", "itd've": "it'd've", "it'dve": "it'd've", "itll": "it'll", "let's": "let's",
    "maam": "ma'am", "mightnt": "mightn't", "mightnt've": "mightn't've", "mightn'tve": "mightn't've", "mightve": "might've",
    "mustnt": "mustn't", "mustve": "must've", "neednt": "needn't", "notve": "not've", "oclock": "o'clock", "oughtnt": "oughtn't",
    "ow's'at": "'ow's'at", "'ows'at": "'ow's'at", "'ow'sat": "'ow's'at", "shant": "shan't", "shed've": "she'd've", "she'dve": "she'd've",
    "she's": "she's", "shouldve": "should've", "shouldnt": "shouldn't", "shouldnt've": "shouldn't've", "shouldn'tve": "shouldn't've",
    "somebody'd": "somebodyd", "somebodyd've": "somebody'd've", "somebody'dve": "somebody'd've", "somebodyll": "somebody'll",
    "somebodys": "somebody's", "someoned": "someone'd", "someoned've": "someone'd've", "someone'dve": "someone'd've",
    "someonell": "someone'll", "someones": "someone's", "somethingd": "something'd", "somethingd've": "something'd've",
    "something'dve": "something'd've", "somethingll": "something'll", "thats": "that's", "thered": "there'd", "thered've": "there'd've",
    "there'dve": "there'd've", "therere": "there're", "theres": "there's", "theyd": "they'd", "theyd've": "they'd've",
    "they'dve": "they'd've", "theyll": "they'll", "theyre": "they're", "theyve": "they've", "twas": "'twas", "wasnt": "wasn't",
    "wed've": "we'd've", "we'dve": "we'd've", "weve": "we've", "werent": "weren't", "whatll": "what'll", "whatre": "what're",
    "whats": "what's", "whatve": "what've", "whens": "when's", "whered": "where'd", "wheres": "where's", "whereve": "where've",
    "whod": "who'd", "whod've": "who'd've", "who'dve": "who'd've", "wholl": "who'll", "whos": "who's", "whove": "who've", "whyll": "why'll",
    "whyre": "why're", "whys": "why's", "wont": "won't", "wouldve": "would've", "wouldnt": "wouldn't", "wouldnt've": "wouldn't've",
    "wouldn'tve": "wouldn't've", "yall": "y'all", "yall'll": "y'all'll", "y'allll": "y'all'll", "yall'd've": "y'all'd've",
    "y'alld've": "y'all'd've", "y'all'dve": "y'all'd've", "youd": "you'd", "youd've": "you'd've", "you'dve": "you'd've",
    "youll": "you'll", "youre": "you're", "youve": "you've",
    # NUMBERS
    "none": "0", "zero": "0", "one": "1", "two": "2",
    "three": "3", "four": "4", "five": "5", "six": "6",
    "seven": "7", "eight": "8", "nine": "9", "ten": "10",
}
# pylint: enable=line-too-long

PUNCT = [
    ";", "/", "[", "]", "\"", "{", "}",
    "(", ")", "=", "+", "\\", "_", "-",
    ">", "<", "@", "`", ",", "?", "!",
]
ARTICLES = {"a", "an", "the"}
