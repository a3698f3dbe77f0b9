"""COCO captioning evaluator: CIDEr-D (default), BLEU-4, ROUGE-L.

Parity target: reference evaluators/proj/paligemma/transfers/coco_caption.py
(which calls pycocoevalcap). This image has no pycocoevalcap/java, so the
scorers are the numpy/python implementations in textmetrics.py with a
PTB-lite tokenizer, including a native METEOR (exact+stem modules; see
textmetrics.meteor). "spice" stays gated (needs the java scene-graph
parser).

Batches must carry "image/id" and (multi-reference) "captions".
"""

from __future__ import annotations

import collections

import jax

import big_vision_tpu.evaluators.common as c
import big_vision_tpu.pp.tokenizer
import big_vision_tpu.utils as u
from big_vision_tpu.evaluators.proj.paligemma.transfers import textmetrics

API = "jit"


class Evaluator:
  """Caption-generation metrics over decoded tokens."""

  def __init__(self, predict_fn, tokenizer=None, metrics=("cider",),
               preds_outfile="{workdir}/{name}_{split}_preds.json",
               annot_outfile="{workdir}/{name}_{split}_annotations.json",
               *, data, devices, **kw):
    self.get_data_iter, self.steps = c.eval_input_pipeline(
        keep_on_cpu={"image/id", "captions"}, data=data, devices=devices,
        **kw)
    self.preds_outfile = c.resolve_outfile(
        preds_outfile, name=data.get("name"), split=data.get("split"))
    self.annot_outfile = c.resolve_outfile(
        annot_outfile, name=data.get("name"), split=data.get("split"))
    self.metrics = metrics
    self.tok = big_vision_tpu.pp.tokenizer.get_tokenizer(tokenizer)
    self.decode = predict_fn

  def run(self, train_state):
    gts, res = [], []
    for _, batch in zip(range(self.steps), self.get_data_iter()):
      tokens = u.get_local_slice_from_fsarray(
          self.decode(train_state, batch))
      ex_masks = u.get_local_slice_from_fsarray(batch["_mask"])

      for i in range(len(tokens)):
        if ex_masks[i] == 0:
          continue
        image_id = _item(batch["image/id"][i])
        res.append({"image_id": image_id,
                    "caption": self.tok.to_str(tokens[i],
                                               stop_at_eos=True)})
        for caption in batch["captions"][i]:
          if isinstance(caption, bytes):
            caption = caption.decode()
          gts.append({"image_id": image_id, "caption": str(caption)})

    # COCO results format: https://cocodataset.org/#format-results
    res = c.multiprocess_write_json(self.preds_outfile, res)
    gts = c.multiprocess_write_json(self.annot_outfile, gts)

    if jax.process_index():  # Host 0 scores.
      return
    for key, score in self.evaluate(gts, res).items():
      yield key, score

  def evaluate(self, gt_annotations, res_annotations):
    """Tokenizes and scores with the requested metrics."""
    scorers = {
        "cider": textmetrics.cider_d,
        "bleu-4": textmetrics.bleu4,
        "rouge": textmetrics.rouge_l,
        "meteor": textmetrics.meteor,
    }
    # Remap image ids to dense ints; tokenize once.
    iid_map = collections.defaultdict(lambda: len(iid_map))
    res = {iid_map[x["image_id"]]:
           [textmetrics.ptb_lite_tokenize(x["caption"])]
           for x in res_annotations}
    gts = collections.defaultdict(list)
    for x in gt_annotations:
      gts[iid_map[x["image_id"]]].append(
          textmetrics.ptb_lite_tokenize(x["caption"]))
    assert sorted(gts.keys()) == sorted(res.keys())

    scores = {}
    for metric in self.metrics:
      if metric == "spice":
        raise NotImplementedError(
            "spice needs the java scene-graph parser (pycocoevalcap), "
            "not available in this image; use cider/bleu-4/rouge/meteor.")
      scores[metric] = scorers[metric](gts, res)
    return scores


def _item(x):
  x = x.item() if hasattr(x, "item") else x
  return x.decode() if isinstance(x, bytes) else x
