"""Generative ("scoring") classifier: pick the label with lowest caption NLL.

Parity target: reference evaluators/proj/cappa/scoring_classifier.py. All
class names are tokenized once with `pp_txt`; the predict_fn receives them
as `_label_tokens` and returns per-class scores [B, n_labels]; prec@1 is
averaged by the `mean` evaluator machinery.
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
  """Tokenizes every class label string with the given pp string."""
  to_tokens = pp_builder.get_preprocess_fn(pp_txt)
  rows = [to_tokens({"label": name})["labels"]
          for name in CLASS_NAMES[dataset_name]()]
  return np.array(rows)


def Evaluator(predict_fn, pp_txt, *a, data, **kw):  # pylint: disable=invalid-name
  """Classification accuracy by scoring every class caption."""
  class_tokens = jnp.asarray(get_classes(data["name"], pp_txt))

  def prec_at_1(train_state, batch, *ia, **ikw):
    scores = predict_fn(
        train_state, {"_label_tokens": class_tokens, **batch}, *ia, **ikw)
    hit = jnp.argmax(scores, axis=-1) == batch["label"]
    return {"prec@1": hit}

  return mean.Evaluator(prec_at_1, *a, data=data, **kw)
