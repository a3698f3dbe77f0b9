"""Generative ("scoring") classifier: pick the label with lowest caption NLL.

Parity target: reference evaluators/proj/cappa/scoring_classifier.py. All
class names are tokenized once with `pp_txt`; the predict_fn receives them
as `_label_tokens` and returns per-class scores; prec@1 is averaged by the
`mean` evaluator machinery.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from big_vision_tpu.datasets import imagenet as i1k_names
from big_vision_tpu.evaluators import mean
from big_vision_tpu.pp import builder as pp_builder

API = "jit"

CLASS_NAMES = {
    "imagenet2012": i1k_names.clip_imagenet_class_names,
}


@functools.lru_cache(maxsize=None)
def get_classes(dataset_name, pp_txt):
  """Tokenizes all class label strings with the given pp string."""
  pp_fn = pp_builder.get_preprocess_fn(pp_txt)
  return np.array([pp_fn({"label": name})["labels"]
                   for name in CLASS_NAMES[dataset_name]()])


def scoring(predict_fn, tokenized_labels):
  def _scoring_fn(train_state, batch, *a, **kw):
    batch = {"_label_tokens": jnp.asarray(tokenized_labels), **batch}
    scores = predict_fn(train_state, batch, *a, **kw)
    predictions = jnp.argmax(scores, axis=-1)
    return {"prec@1": predictions == batch["label"]}
  return _scoring_fn


class Evaluator(mean.Evaluator):
  """Classification accuracy by scoring every class caption."""

  def __init__(self, predict_fn, pp_txt, *a, data, **kw):
    cls_tokens = get_classes(data["name"], pp_txt)
    super().__init__(scoring(predict_fn, cls_tokens), *a, data=data, **kw)
