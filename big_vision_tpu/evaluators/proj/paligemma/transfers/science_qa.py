"""ScienceQA evaluator: multiple-choice accuracy via answer-letter parsing.

Parity target: reference evaluators/proj/paligemma/transfers/science_qa.py.
The model is expected to generate "The answer is X."; the letter is parsed
out (case-insensitive) and compared to the parsed GT; unparseable outputs
count as failures.
"""

from __future__ import annotations

import re

import big_vision_tpu.evaluators.common as c
import big_vision_tpu.pp.tokenizer
import big_vision_tpu.utils as u

API = "jit"
FAILURE = "failed"


class Evaluator:
  """Parses 'the answer is X.' and scores exact letter match."""

  def __init__(self, predict_fn, tokenizer,
               outfile="{workdir}/{split}.json",
               out_question_key="question_id", *, data, devices, **kw):
    self.get_data_iter, self.steps = c.eval_input_pipeline(
        keep_on_cpu={"answer", "question_id"}, data=data, devices=devices,
        **kw)
    self.outfile = c.resolve_outfile(outfile, split=data.get("split"))
    self.out_question_key = out_question_key
    self.tok = big_vision_tpu.pp.tokenizer.get_tokenizer(tokenizer)
    self.decode = predict_fn

  def postproc(self, raw_answer):
    match = re.match(r"the answer is ([a-z])\.", raw_answer.lower())
    return match.groups()[0] if match else FAILURE

  def run(self, train_state):
    accuracies, fail_parse, json_out = [], [], []
    for _, batch in zip(range(self.steps), self.get_data_iter()):
      tokens = u.get_local_slice_from_fsarray(
          self.decode(train_state, batch))
      ex_masks = u.get_local_slice_from_fsarray(batch["_mask"])

      for i in range(len(tokens)):
        if ex_masks[i] == 0:
          continue
        raw_answer = self.tok.to_str(tokens[i], stop_at_eos=True)
        answer = self.postproc(raw_answer)
        if "answer" in batch:
          gt = batch["answer"][i]
          gt = self.postproc(gt.decode() if isinstance(gt, bytes)
                             else str(gt))
          gts = [gt]
          accuracies.append(float(answer == gt))
          fail_parse.append(float(answer == FAILURE))
        else:
          gts = []
        json_out.append({
            self.out_question_key: _item(batch["question_id"][i]),
            "raw_answer": raw_answer, "answer": answer,
        } | ({"gts": gts} if gts else {}))

    sum_accs, num_fail, num_accs, num = c.process_sum(
        [sum(accuracies), sum(fail_parse), len(accuracies),
         len(json_out)])
    if num_accs > 0:
      yield "acc", sum_accs / num_accs
      yield "parsefail", num_fail / num_accs
    yield "num", num
    c.multiprocess_write_json(self.outfile, json_out)


def _item(x):
  return x.item() if hasattr(x, "item") else x
