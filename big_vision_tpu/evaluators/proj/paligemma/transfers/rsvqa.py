"""RSVQA (remote-sensing VQA) evaluator: per-question-type accuracies.

Parity target: reference evaluators/proj/paligemma/transfers/rsvqa.py.
Reports overall accuracy (OA = acc_any), average accuracy over question
types (AA), and the "nonum" subsets used for RSVQA-LR/HR.
"""

from __future__ import annotations

import big_vision_tpu.evaluators.common as c
import big_vision_tpu.pp.tokenizer
import big_vision_tpu.utils as u
from big_vision_tpu.evaluators.proj.paligemma.transfers.textmetrics import (
    anls_metric)

API = "jit"

QUESTION_TYPES = ("comp", "count", "presence", "rural_urban", "area")

ACC_SUBSETS = (
    ("nonum", ("comp", "presence", "rural_urban")),  # rsvqa_lr
    ("nonum", ("comp", "presence")),  # rsvqa_hr
)


class Evaluator:
  """VQA scoring plus per-question-type breakdown (OA/AA/subsets)."""

  def __init__(self, predict_fn, tokenizer, to_lower=False,
               outfile="{workdir}/{split}.json", *, data, devices, **kw):
    self.get_data_iter, self.steps = c.eval_input_pipeline(
        keep_on_cpu={"answers", "answer", "question_id", "question_type"},
        data=data, devices=devices, **kw)
    self.outfile = c.resolve_outfile(outfile, split=data.get("split"))
    self.tok = big_vision_tpu.pp.tokenizer.get_tokenizer(tokenizer)
    self.postproc = (lambda s: s.lower()) if to_lower else (lambda s: s)
    self.decode = predict_fn

  def run(self, train_state):
    accuracies, accuracies_any, anls_values, json_out = [], [], [], []
    counts_per_type = {t: 0 for t in QUESTION_TYPES}
    accs_per_type = {t: [] for t in QUESTION_TYPES}

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
          gts = [self.postproc(_to_str(a)) for a in gt_answers]
          num_match = sum(answer == gt for gt in gts)
          accuracies.append(min(1.0, num_match / 3.0))
          accuracies_any.append(min(1.0, float(num_match)))
          anls_values.append(max(anls_metric(gt, answer) for gt in gts))
          qtype = _to_str(batch["question_type"][i])
          accs_per_type[qtype].append(accuracies_any[-1])
          counts_per_type[qtype] += 1
        else:
          gts = []
        json_out.append({
            "question_id": _item(batch["question_id"][i]),
            "answer": answer} | ({"gts": gts} if gts else {}))

    sum_accs, sum_any, sum_anls, num_accs, num = c.process_sum(
        [sum(accuracies), sum(accuracies_any), sum(anls_values),
         len(accuracies), len(json_out)])
    sum_per_type, cnt_per_type = c.process_sum(
        [{k: sum(v) for k, v in accs_per_type.items()}, counts_per_type])

    if num_accs:
      yield "acc", sum_accs / num_accs
      yield "acc_any", sum_any / num_accs  # Overall Accuracy (OA).
      yield "anls", sum_anls / num_accs
      acc_types = {}
      for k, v in sum_per_type.items():
        if cnt_per_type[k]:
          acc_types[k] = v / cnt_per_type[k]
          yield f"acc_{k}", acc_types[k]
      if acc_types:
        yield "acc_avg", sum(acc_types.values()) / len(acc_types)  # AA.
      for postfix, types in ACC_SUBSETS:
        if all(t in acc_types for t in types):
          yield f"acc_avg_{postfix}", sum(
              v for k, v in acc_types.items() if k in types) / len(types)
    yield "num", num
    c.multiprocess_write_json(self.outfile, json_out)


def _to_str(x):
  return x.decode() if isinstance(x, bytes) else str(x)


def _item(x):
  return x.item() if hasattr(x, "item") else x
