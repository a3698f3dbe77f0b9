"""Inference-and-store evaluator: decode and dump predictions to json.

Behavior parity: reference evaluators/proj/paligemma/transfers/storepreds.py.
Writes {id, caption} records (merged across processes) and reports the
global example count from host 0.
"""

from __future__ import annotations

import jax

import big_vision_tpu.evaluators.common as c
from big_vision_tpu.evaluators.proj.paligemma.transfers import driver

API = "jit"


class Evaluator(driver.DecodeScorer):
  """Stores {id, caption} records for every example."""

  def __init__(self, predict_fn, tokenizer=None,
               preds_outfile="{workdir}/{name}_{split}_preds.json",
               annot_outfile="{workdir}/{name}_{split}_annotations.json",
               id_key="id", *, data, **kw):
    self.CPU_KEYS = frozenset({id_key})  # instance-level; read by super()
    self.id_key = id_key
    super().__init__(predict_fn, tokenizer, data=data, **kw)
    names = dict(name=data.get("name"), split=data.get("split", ""))
    self.preds_outfile = c.resolve_outfile(preds_outfile, **names)
    self.annot_outfile = c.resolve_outfile(annot_outfile, **names)

  def run(self, train_state):
    records = [{self.id_key: str(ex.text(self.id_key)), "caption": caption}
               for caption, ex in self.examples(train_state)]
    records = c.multiprocess_write_json(self.preds_outfile, records)
    if jax.process_index() == 0:  # Host 0 reports.
      yield "num_examples", len(records)
