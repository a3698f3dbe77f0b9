"""ChartQA evaluator: exact match + relaxed (5% numeric tolerance) match.

Parity target: reference evaluators/proj/paligemma/transfers/chartqa.py.
Relaxed correctness per arXiv:2203.10244 §5.1: numeric answers within 5%
relative error count as correct; non-numeric answers need exact match.
"""

from __future__ import annotations

import big_vision_tpu.evaluators.common as c
import big_vision_tpu.pp.tokenizer
import big_vision_tpu.utils as u

API = "jit"


class Evaluator:
  """Exact + relaxed accuracy against a single GT answer."""

  def __init__(self, predict_fn, tokenizer, to_lower=False,
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
    self.postproc = (lambda s: s.lower()) if to_lower else (lambda s: s)
    self.decode = predict_fn

  def run(self, train_state):
    accuracies, relaxed_accuracies, json_out = [], [], []
    for _, batch in zip(range(self.steps), self.get_data_iter()):
      tokens = u.get_local_slice_from_fsarray(
          self.decode(train_state, batch))
      ex_masks = u.get_local_slice_from_fsarray(batch["_mask"])

      for i in range(len(tokens)):
        if ex_masks[i] == 0:
          continue
        answer = self.postproc(self.tok.to_str(tokens[i],
                                               stop_at_eos=True))
        gt = batch["answer"][i]
        gt = self.postproc(gt.decode() if isinstance(gt, bytes) else str(gt))
        accuracies.append(float(answer == gt))
        relaxed_accuracies.append(_relaxed_match(gt, answer))
        json_out.append({
            self.out_question_key: _item(batch["question_id"][i]),
            self.out_answer_key: answer, "gt": gt,
            "relaxed_match": relaxed_accuracies[-1]})

    sum_accs, sum_relaxed, num = c.process_sum(
        [sum(accuracies), sum(relaxed_accuracies), len(accuracies)])
    if num:
      yield "acc", sum_accs / num
      yield "relaxed_acc", sum_relaxed / num
    yield "num", num
    c.multiprocess_write_json(self.outfile, json_out)


def _item(x):
  return x.item() if hasattr(x, "item") else x


def _to_float(text):
  try:
    if text.endswith("%"):
      return float(text.rstrip("%")) / 100.0
    return float(text)
  except ValueError:
    return None


def _relaxed_match(target, prediction, max_relative_error=0.05):
  """5% relative tolerance for numbers; exact match otherwise (or gt==0)."""
  prediction_float = _to_float(prediction)
  target_float = _to_float(target)
  if prediction_float is not None and target_float:
    rel = abs(prediction_float - target_float) / abs(target_float)
    return rel <= max_relative_error
  return prediction == target
