"""Simple-VQA evaluator (OCR-VQA, OKVQA, A-OKVQA): EM accuracy + ANLS.

Parity target: reference evaluators/proj/paligemma/transfers/vqa.py.
Expects batches with `question_id` and `answer` (single GT) or `answers`
(multi GT, VQA-style min(matches/3, 1) scoring). Decoding runs on device;
detokenization and scoring are host-side over the local slice, reduced
across processes with sufficient statistics.
"""

from __future__ import annotations

import big_vision_tpu.evaluators.common as c
import big_vision_tpu.pp.tokenizer
import big_vision_tpu.utils as u
from big_vision_tpu.evaluators.proj.paligemma.transfers.textmetrics import (
    anls_metric)

API = "jit"


class Evaluator:
  """EM/any/ANLS scoring of decoded answers against one or many GTs."""

  def __init__(self, predict_fn, tokenizer, to_lower=False,
               outfile="{workdir}/{split}.json",
               out_question_key="question_id", out_answer_key="answer",
               *, data, devices, **kw):
    self.get_data_iter, self.steps = c.eval_input_pipeline(
        keep_on_cpu={"answers", "answer", "question_id"},
        data=data, devices=devices, **kw)
    self.outfile = c.resolve_outfile(outfile, split=data.get("split"))
    self.out_question_key = out_question_key
    self.out_answer_key = out_answer_key
    self.tok = big_vision_tpu.pp.tokenizer.get_tokenizer(tokenizer)
    self.postproc = (lambda s: s.lower()) if to_lower else (lambda s: s)
    self.decode = predict_fn

  def run(self, train_state):
    accuracies, accuracies_any, anls_values, json_out = [], [], [], []
    for _, batch in zip(range(self.steps), self.get_data_iter()):
      tokens = u.get_local_slice_from_fsarray(
          self.decode(train_state, batch))
      ex_masks = u.get_local_slice_from_fsarray(batch["_mask"])

      for i in range(len(tokens)):
        if ex_masks[i] == 0:
          continue
        answer = self.postproc(self.tok.to_str(tokens[i],
                                               stop_at_eos=True))
        if "answer" in batch:
          gt = self.postproc(_to_str(batch["answer"][i]))
          gts = [gt]
          accuracies.append(float(answer == gt))
          accuracies_any.append(float(answer == gt))
          anls_values.append(anls_metric(gt, answer))
        elif "answers" in batch and len(gt_answers := batch["answers"][i]):
          # Multi-GT VQA scoring: https://visualqa.org/evaluation.html
          gts = [self.postproc(_to_str(a)) for a in gt_answers]
          num_match = sum(answer == gt for gt in gts)
          accuracies.append(min(1.0, num_match / 3.0))
          accuracies_any.append(min(1.0, float(num_match)))
          anls_values.append(max(anls_metric(gt, answer) for gt in gts))
        else:
          gts = []
        json_out.append({
            self.out_question_key: _item(batch["question_id"][i]),
            self.out_answer_key: answer} | ({"gts": gts} if gts else {}))

    sum_accs, sum_any, sum_anls, num_accs, num = c.process_sum(
        [sum(accuracies), sum(accuracies_any), sum(anls_values),
         len(accuracies), len(json_out)])
    if num_accs:
      yield "acc", sum_accs / num_accs
      yield "acc_any", sum_any / num_accs
      yield "anls", sum_anls / num_accs
    yield "num", num
    c.multiprocess_write_json(self.outfile, json_out)


def _to_str(x):
  return x.decode() if isinstance(x, bytes) else str(x)


def _item(x):
  return x.item() if hasattr(x, "item") else x
