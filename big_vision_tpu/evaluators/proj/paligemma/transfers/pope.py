"""POPE (object-hallucination probing) evaluator: yes/no accuracy.

Parity target: reference evaluators/proj/paligemma/transfers/pope.py.
Also reports the fraction of decoded answers that are a valid "yes"/"no".
"""

from __future__ import annotations

import big_vision_tpu.evaluators.common as c
import big_vision_tpu.pp.tokenizer
import big_vision_tpu.utils as u

API = "jit"


class Evaluator:
  """Yes/no accuracy + validity rate."""

  def __init__(self, predict_fn, tokenizer,
               outfile="{workdir}/{split}.json",
               out_question_key="question_id", out_answer_key="answer",
               *, data, devices, **kw):
    self.get_data_iter, self.steps = c.eval_input_pipeline(
        keep_on_cpu={"answer", "question_id"}, data=data, devices=devices,
        **kw)
    self.outfile = c.resolve_outfile(outfile, split=data.get("split"))
    self.out_question_key = out_question_key
    self.out_answer_key = out_answer_key
    self.tok = big_vision_tpu.pp.tokenizer.get_tokenizer(tokenizer)
    self.decode = predict_fn

  def run(self, train_state):
    accuracies, valid, json_out = [], [], []
    for _, batch in zip(range(self.steps), self.get_data_iter()):
      tokens = u.get_local_slice_from_fsarray(
          self.decode(train_state, batch))
      ex_masks = u.get_local_slice_from_fsarray(batch["_mask"])

      for i in range(len(tokens)):
        if ex_masks[i] == 0:
          continue
        answer = self.tok.to_str(tokens[i], stop_at_eos=True).lower()
        gt = batch["answer"][i]
        gt = gt.decode() if isinstance(gt, bytes) else str(gt)
        accuracies.append(float(answer == gt))
        valid.append(float(answer in ("yes", "no")))
        json_out.append({
            self.out_question_key: _item(batch["question_id"][i]),
            self.out_answer_key: answer})

    sum_accs, sum_valid, num = c.process_sum(
        [sum(accuracies), sum(valid), len(accuracies)])
    if num:
      yield "acc", sum_accs / num
      yield "valid_percent", sum_valid / num
    yield "num", num
    c.multiprocess_write_json(self.outfile, json_out)


def _item(x):
  return x.item() if hasattr(x, "item") else x
