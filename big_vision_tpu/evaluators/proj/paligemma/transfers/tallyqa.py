"""TallyQA (counting VQA) evaluator: accuracy overall, by difficulty, by count.

Parity target: reference evaluators/proj/paligemma/transfers/tallyqa.py.
Number words are normalized to numerals ("one" -> "1") before comparison.
"""

from __future__ import annotations

import big_vision_tpu.evaluators.common as c
import big_vision_tpu.pp.tokenizer
import big_vision_tpu.utils as u

API = "jit"

_LARGEST_COUNT = 15


class Evaluator:
  """Counting accuracy with simple/complex and per-count breakdowns."""

  def __init__(self, predict_fn, tokenizer, *, devices, **kw):
    self.get_data_iter, self.steps = c.eval_input_pipeline(
        keep_on_cpu={"answer", "issimple"}, devices=devices, **kw)
    self.tok = big_vision_tpu.pp.tokenizer.get_tokenizer(tokenizer)
    self.decode = predict_fn

  def run(self, train_state):
    accs = {"all": [], "simple": [], "complex": []}
    accs.update({f"count_{i}": [] for i in range(_LARGEST_COUNT + 1)})

    for _, batch in zip(range(self.steps), self.get_data_iter()):
      tokens = u.get_local_slice_from_fsarray(
          self.decode(train_state, batch))
      ex_masks = u.get_local_slice_from_fsarray(batch["_mask"])

      for i in range(len(tokens)):
        if ex_masks[i] == 0:
          continue
        answer = _number_word_to_numeral(
            self.tok.to_str(tokens[i], stop_at_eos=True))
        gt = batch["answer"][i]
        gt = _number_word_to_numeral(
            gt.decode() if isinstance(gt, bytes) else str(gt))
        accs["all"].append(float(answer == gt))

        if "issimple" in batch:
          # Train split carries -1 (unannotated); skip those.
          if batch["issimple"][i] == 1:
            accs["simple"].append(float(answer == gt))
          elif batch["issimple"][i] == 0:
            accs["complex"].append(float(answer == gt))
        if f"count_{gt}" in accs:
          accs[f"count_{gt}"].append(float(answer == gt))

    sum_accs = c.process_sum({k: sum(v) for k, v in accs.items()})
    num_accs = c.process_sum({k: len(v) for k, v in accs.items()})

    if n := num_accs["all"]:
      yield "acc", sum_accs["all"] / n
      yield "num", n
    for key in sum_accs:
      if key != "all" and num_accs[key]:
        yield f"acc/{key}", sum_accs[key] / num_accs[key]
        yield f"num/{key}", num_accs[key]


def _number_word_to_numeral(s):
  return REPLACEMENTS.get(s.lower(), s)


REPLACEMENTS = {
    "none": "0", "zero": "0", "one": "1", "two": "2", "three": "3",
    "four": "4", "five": "5", "six": "6", "seven": "7", "eight": "8",
    "nine": "9", "ten": "10", "eleven": "11", "twelve": "12",
    "thirteen": "13", "fourteen": "14", "fifteen": "15", "sixteen": "16",
    "seventeen": "17", "eighteen": "18", "nineteen": "19", "twenty": "20",
}
