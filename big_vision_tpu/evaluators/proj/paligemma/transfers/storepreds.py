"""Inference-and-store evaluator: decode and dump predictions to json.

Parity target: reference evaluators/proj/paligemma/transfers/storepreds.py.
"""

from __future__ import annotations

import jax

import big_vision_tpu.evaluators.common as c
import big_vision_tpu.pp.tokenizer
import big_vision_tpu.utils as u

API = "jit"


class Evaluator:
  """Stores {id, caption} records for every example."""

  def __init__(self, predict_fn, tokenizer=None,
               preds_outfile="{workdir}/{name}_{split}_preds.json",
               annot_outfile="{workdir}/{name}_{split}_annotations.json",
               id_key="id", *, data, devices, **kw):
    self.id_key = id_key
    self.get_data_iter, self.steps = c.eval_input_pipeline(
        keep_on_cpu={id_key}, data=data, devices=devices, **kw)
    self.preds_outfile = c.resolve_outfile(
        preds_outfile, name=data.get("name"), split=data.get("split", ""))
    self.annot_outfile = c.resolve_outfile(
        annot_outfile, name=data.get("name"), split=data.get("split", ""))
    self.tok = big_vision_tpu.pp.tokenizer.get_tokenizer(tokenizer)
    self.decode = predict_fn

  def run(self, train_state):
    res = []
    for _, batch in zip(range(self.steps), self.get_data_iter()):
      tokens = u.get_local_slice_from_fsarray(
          self.decode(train_state, batch))
      ex_masks = u.get_local_slice_from_fsarray(batch["_mask"])
      for i in range(len(tokens)):
        if ex_masks[i] == 0:
          continue
        caption = self.tok.to_str(tokens[i], stop_at_eos=True)
        image_id = batch[self.id_key][i]
        if isinstance(image_id, bytes):
          image_id = image_id.decode()
        res.append({self.id_key: str(image_id), "caption": caption})

    res = c.multiprocess_write_json(self.preds_outfile, res)
    if jax.process_index():  # Host 0 reports.
      return
    yield "num_examples", len(res)
