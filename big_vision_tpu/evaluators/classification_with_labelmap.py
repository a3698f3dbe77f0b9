"""Classification eval through a label-space mapping (e.g. i21k -> i1k).

Referenced by the reference's FlexiViT configs
(configs/proj/flexivit/i21k_sup.py:126, i21k_distill.py:150:
``type='classification_with_labelmap', label_mapping='i1k_i21k'``) — the
evaluator module itself is absent from the public reference snapshot, so
this implements the documented behavior: the model predicts over a large
label space (e.g. 21843 ImageNet-21k classes) while the eval dataset is
labeled in a smaller one (e.g. 1000 ImageNet-1k classes); `label_mapping`
gives, for each small-space class, its index in the model's logit space,
and metrics are computed over the gathered logit columns.

`label_mapping` accepts:
  * a list/tuple/array of logit indices (len == eval num_classes),
  * a path to a .json (list) or .npy/.npz (array) file,
  * a named mapping registered in datasets/imagenet/labelmaps.json
    (e.g. 'i1k_i21k'); absent names raise with instructions rather than
    guessing a mapping by class-name similarity.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.evaluators import common

API = "jit"

_NAMED_FILE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "datasets", "imagenet", "labelmaps.json")


def resolve_label_mapping(label_mapping):
  """Returns an int32 index array: small-space class -> logit column."""
  if isinstance(label_mapping, (list, tuple, np.ndarray)):
    return np.asarray(label_mapping, np.int32)
  if not isinstance(label_mapping, str):
    raise TypeError(f"Bad label_mapping: {type(label_mapping)}")
  if label_mapping.endswith(".json"):
    with open(label_mapping) as f:
      return np.asarray(json.load(f), np.int32)
  if label_mapping.endswith((".npy", ".npz")):
    arr = np.load(label_mapping)
    if hasattr(arr, "files"):  # npz: single array expected
      arr = arr[arr.files[0]]
    return np.asarray(arr, np.int32)
  if os.path.exists(_NAMED_FILE):
    with open(_NAMED_FILE) as f:
      named = json.load(f)
    if label_mapping in named:
      return np.asarray(named[label_mapping], np.int32)
  raise ValueError(
      f"Unknown label_mapping {label_mapping!r}. Pass an index list, a "
      f".json/.npy file path, or add the mapping under {_NAMED_FILE!r} "
      "(a name -> [logit indices] dict). Name-based guessing between "
      "label spaces is deliberately not implemented.")


def make_eval_fn(predict_fn, loss_name, mapping):
  @jax.jit
  def _eval_fn(train_state, batch, labels, mask):
    logits, *_ = predict_fn(train_state, batch)
    logits = jnp.take(logits, jnp.asarray(mapping), axis=-1)
    mask = mask * labels.max(axis=1)
    loss = getattr(u, loss_name)(logits=logits, labels=labels,
                                 reduction=False)
    loss = jnp.sum(loss * mask)
    top1 = jnp.argmax(logits, axis=1)
    correct = jnp.take_along_axis(labels, top1[:, None], axis=1)[:, 0]
    return jnp.sum(correct * mask), loss, jnp.sum(mask)
  return _eval_fn


class Evaluator:

  def __init__(self, predict_fn, loss_name, label_mapping,
               label_key="labels", **kw):
    self.get_data_iter, self.steps = common.eval_input_pipeline(**kw)
    mapping = resolve_label_mapping(label_mapping)
    self.eval_fn = make_eval_fn(predict_fn, loss_name, mapping)
    self.label_key = label_key

  def run(self, train_state):
    ncorrect, loss, nseen = 0, 0, 0
    for _, batch in zip(range(self.steps), self.get_data_iter()):
      batch, _ = common.split_batch(batch)
      labels, mask = batch.pop(self.label_key), batch.pop("_mask")
      batch.pop("_id", None)
      nc, l, ns = jax.device_get(
          self.eval_fn(train_state, batch, labels, mask))
      ncorrect += nc
      loss += l
      nseen += ns
    yield ("prec@1", ncorrect / nseen)
    yield ("loss", loss / nseen)
