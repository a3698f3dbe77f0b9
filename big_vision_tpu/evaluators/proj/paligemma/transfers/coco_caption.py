"""COCO captioning evaluator: CIDEr-D (default), BLEU-4, ROUGE-L, METEOR.

Behavior parity: reference evaluators/proj/paligemma/transfers/coco_caption.py
(which shells out to pycocoevalcap). This image has no pycocoevalcap/java,
so scoring uses the numpy/python implementations in textmetrics.py with a
PTB-lite tokenizer, including a native METEOR (exact+stem modules; see
textmetrics.meteor). "spice" stays gated: it needs the java scene-graph
parser, the same external dependency the reference requires.

Batches must carry "image/id" and (multi-reference) "captions".
"""

from __future__ import annotations

import collections

import jax

import big_vision_tpu.evaluators.common as c
from big_vision_tpu.evaluators.proj.paligemma.transfers import driver
from big_vision_tpu.evaluators.proj.paligemma.transfers import textmetrics

API = "jit"

SCORERS = {
    "cider": "cider_d",
    "bleu-4": "bleu4",
    "rouge": "rouge_l",
    "meteor": "meteor",
}


class Evaluator(driver.DecodeScorer):
  """Caption-generation metrics over decoded tokens."""

  CPU_KEYS = frozenset({"image/id", "captions"})

  def __init__(self, predict_fn, tokenizer=None, metrics=("cider",),
               preds_outfile="{workdir}/{name}_{split}_preds.json",
               annot_outfile="{workdir}/{name}_{split}_annotations.json",
               *, data, **kw):
    super().__init__(predict_fn, tokenizer, data=data, **kw)
    names = dict(name=data.get("name"), split=data.get("split"))
    self.preds_outfile = c.resolve_outfile(preds_outfile, **names)
    self.annot_outfile = c.resolve_outfile(annot_outfile, **names)
    self.metrics = metrics

  def run(self, train_state):
    predictions, references = [], []
    for caption, ex in self.examples(train_state):
      image_id = ex.id("image/id")
      predictions.append({"image_id": image_id, "caption": caption})
      references.extend({"image_id": image_id, "caption": ref}
                        for ref in ex.texts("captions"))

    # COCO results format: https://cocodataset.org/#format-results
    predictions = c.multiprocess_write_json(self.preds_outfile, predictions)
    references = c.multiprocess_write_json(self.annot_outfile, references)

    if jax.process_index() == 0:  # Host 0 scores.
      yield from self.evaluate(references, predictions).items()

  def evaluate(self, gt_annotations, res_annotations):
    """Tokenizes once, then scores with the requested metrics."""
    # Remap image ids to dense ints.
    dense = collections.defaultdict(lambda: len(dense))
    res = {dense[p["image_id"]]: [textmetrics.ptb_lite_tokenize(p["caption"])]
           for p in res_annotations}
    gts = collections.defaultdict(list)
    for a in gt_annotations:
      gts[dense[a["image_id"]]].append(
          textmetrics.ptb_lite_tokenize(a["caption"]))
    assert sorted(gts) == sorted(res), "every prediction needs references"

    scores = {}
    for metric in self.metrics:
      if metric not in SCORERS:
        raise NotImplementedError(
            f"{metric!r}: available metrics are {sorted(SCORERS)}; 'spice' "
            "needs the java scene-graph parser (pycocoevalcap), not "
            "available in this image.")
      scores[metric] = getattr(textmetrics, SCORERS[metric])(gts, res)
    return scores
