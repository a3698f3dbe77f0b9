"""Shared decode-and-score driver for the PaliGemma transfer evaluators.

Every transfer evaluator follows the same shape: run the jitted decode
predict_fn over the eval pipeline, take the host-local slice of the global
result, drop padding examples (the `_mask` contract from
input_pipeline.make_for_inference), detokenize, score on the host, and
reduce sufficient statistics across processes. This module owns that
skeleton once; the per-task evaluators only implement scoring.

Reference behavior being matched: the per-file loops in
evaluators/proj/paligemma/transfers/*.py (e.g. vqav2.py:53-100), which
repeat this pattern verbatim in each evaluator.
"""

from __future__ import annotations

import big_vision_tpu.evaluators.common as c
import big_vision_tpu.pp.tokenizer
import big_vision_tpu.utils as u

API = "jit"


def text_of(value):
  """bytes/np-str -> python str."""
  return value.decode() if isinstance(value, bytes) else str(value)


def scalar_of(value):
  """np scalar -> python scalar (json-serializable)."""
  return value.item() if hasattr(value, "item") else value


class Example:
  """Accessor for one real (non-padding) example of a host batch."""

  __slots__ = ("batch", "i")

  def __init__(self, batch, i):
    self.batch = batch
    self.i = i

  def __contains__(self, key):
    return key in self.batch

  def __getitem__(self, key):
    return self.batch[key][self.i]

  def text(self, key):
    return text_of(self.batch[key][self.i])

  def texts(self, key):
    return [text_of(v) for v in self.batch[key][self.i]]

  def id(self, key="question_id"):
    return scalar_of(self.batch[key][self.i])


class DecodeScorer:
  """Base class owning pipeline construction and the decode loop.

  Subclasses set CPU_KEYS (fields the pipeline must keep on host) and
  consume `self.examples(train_state)` or `self.batches(train_state)`.
  """

  CPU_KEYS = frozenset({"question_id"})

  def __init__(self, predict_fn, tokenizer=None, to_lower=False,
               outfile="{workdir}/{split}.json", *, data, devices, **kw):
    self.get_data_iter, self.steps = c.eval_input_pipeline(
        keep_on_cpu=set(self.CPU_KEYS), data=data, devices=devices, **kw)
    self.outfile = c.resolve_outfile(outfile, split=data.get("split"))
    self.tok = (big_vision_tpu.pp.tokenizer.get_tokenizer(tokenizer)
                if tokenizer is not None else None)
    self.norm = str.lower if to_lower else str
    self.decode = predict_fn

  def batches(self, train_state):
    """Yields (local decoded array, keep bools, host batch) per step."""
    for _, batch in zip(range(self.steps), self.get_data_iter()):
      decoded = u.get_local_slice_from_fsarray(
          self.decode(train_state, batch))
      keep = u.get_local_slice_from_fsarray(batch["_mask"])
      yield decoded, keep, batch

  def examples(self, train_state):
    """Yields (decoded text, Example) for every real local example."""
    for decoded, keep, batch in self.batches(train_state):
      for i in range(len(decoded)):
        if keep[i]:
          text = self.norm(self.tok.to_str(decoded[i], stop_at_eos=True))
          yield text, Example(batch, i)

  def write_json(self, records):
    return c.multiprocess_write_json(self.outfile, records)
