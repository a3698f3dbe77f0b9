"""VQAv2 evaluator: official leave-one-out VQA score, split by answer type.

Parity target: reference evaluators/proj/paligemma/transfers/vqav2.py.
The post-processing (punctuation, articles, contractions, number words)
follows the official VQA evaluation code (https://visualqa.org/evaluation.html,
github.com/GT-Vision-Lab/VQA) — the REPLACEMENTS/PUNCT/ARTICLES tables are
that public standard's data, reproduced for metric parity (including the
digit-comma quirk the official code has).
"""

from __future__ import annotations

import re

import numpy as np

import big_vision_tpu.evaluators.common as c
import big_vision_tpu.pp.tokenizer
import big_vision_tpu.utils as u

API = "jit"


class Evaluator:
  """Leave-one-out VQA accuracy over 10 annotator answers."""

  def __init__(self, predict_fn, tokenizer,
               outfile="{workdir}/{split}.json", *, data, devices, **kw):
    self.get_data_iter, self.steps = c.eval_input_pipeline(
        keep_on_cpu={"answers", "answer_type", "question_type",
                     "question_id"},
        data=data, devices=devices, **kw)
    self.outfile = c.resolve_outfile(outfile, split=data.get("split"))
    self.tok = big_vision_tpu.pp.tokenizer.get_tokenizer(tokenizer)
    self.decode = predict_fn

  def run(self, train_state):
    accuracies_by_type = {"yes/no": [], "number": [], "other": []}
    json_out = []

    for _, batch in zip(range(self.steps), self.get_data_iter()):
      tokens = u.get_local_slice_from_fsarray(
          self.decode(train_state, batch))
      ex_masks = u.get_local_slice_from_fsarray(batch["_mask"])

      for i in range(len(tokens)):
        if ex_masks[i] == 0:
          continue
        answer = self.tok.to_str(tokens[i], stop_at_eos=True)
        rec = {"question_id": _item(batch["question_id"][i]),
               "answer": answer}

        if len(gt_answers := batch["answers"][i]):
          gt_answers = [stripspace_vqav2(_to_str(a)) for a in gt_answers]
          answer = stripspace_vqav2(answer)
          # Only post-process when annotators disagree (official quirk).
          if len(set(gt_answers)) > 1:
            answer = postprocess_vqav2_text(answer)
            gt_answers = [postprocess_vqav2_text(a) for a in gt_answers]

          # Accuracy = mean over the ten leave-one-out annotator subsets;
          # 100% as soon as 3 remaining annotators agree.
          matches = answer == np.array(gt_answers)
          acc = np.mean([
              np.clip(np.sum(np.delete(matches, j)) / 3, 0, 1)
              for j in range(10)])
          accuracies_by_type[_to_str(batch["answer_type"][i])].append(acc)

          rec["answer_raw"] = rec["answer"]
          rec["answer"] = answer
          rec["gts"] = gt_answers
        json_out.append(rec)

    sum_accs = c.process_sum(
        {k: sum(v) for k, v in accuracies_by_type.items()})
    num_accs = c.process_sum(
        {k: len(v) for k, v in accuracies_by_type.items()})
    num = c.process_sum(len(json_out))

    if n := sum(num_accs.values()):
      yield "acc", sum(sum_accs.values()) / n
    if n := num_accs["yes/no"]:
      yield "acc/yesno", sum_accs["yes/no"] / n
      yield "num/yesno", n
    if n := num_accs["number"]:
      yield "acc/number", sum_accs["number"] / n
      yield "num/number", n
    if n := num_accs["other"]:
      yield "acc/other", sum_accs["other"] / n
      yield "num/other", n
    yield "num", num
    c.multiprocess_write_json(self.outfile, json_out)


def _to_str(x):
  return x.decode() if isinstance(x, bytes) else str(x)


def _item(x):
  return x.item() if hasattr(x, "item") else x


def stripspace_vqav2(txt):
  return txt.replace("\n", " ").replace("\t", " ").strip()


def postprocess_vqav2_text(txt):
  """Official VQA answer normalization (see module docstring)."""
  has_digit_comma = re.search(r"(\d)(\,)(\d)", txt) is not None

  out = txt
  for p in PUNCT:
    # The digit-comma condition reproduces the official code's behavior.
    if has_digit_comma or f"{p} " in txt or f" {p}" in txt:
      out = out.replace(p, "")
    else:
      out = out.replace(p, " ")

  # Remove full-stops that are not part of a number.
  out = re.sub(r"(?!<=\d)(\.)(?!\d)", "", out, flags=re.UNICODE)

  words = []
  for word in out.lower().split():
    if word not in ARTICLES:
      words.append(REPLACEMENTS.get(word, word))
  return " ".join(words)


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
