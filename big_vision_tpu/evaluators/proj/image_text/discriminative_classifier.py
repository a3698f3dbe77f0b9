"""Zero-shot classification via prompt-ensembled text embeddings.

Parity target: reference evaluators/proj/image_text/
discriminative_classifier.py: for each class, embed `{template.format(
class_name)}` for every prompt template, average the normalized text
embeddings, re-normalize; classify eval images by cosine similarity.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.evaluators import common
from big_vision_tpu.evaluators.proj.image_text import prompt_engineering
from big_vision_tpu.pp import builder as pp_builder

API = "jit"


class Evaluator:
  """cfg keys: data/pp_fn/batch_size (image side), dataset_names (for class
  names), prompt_templates, pp_txt (tokenization pp applied to 'text'),
  label_key."""

  def __init__(self, predict_fn, dataset_names=("imagenet2012",),
               class_name_source="clip", prompt_templates="clip_paper",
               pp_txt=None, label_key="label", canonicalize=True, **kw):
    self.get_data_iter, self.steps = common.eval_input_pipeline(**kw)
    self.predict_fn = predict_fn
    self.dataset_name = (dataset_names[0]
                         if isinstance(dataset_names, (list, tuple))
                         else dataset_names)
    self.class_names = prompt_engineering.get_class_names(
        self.dataset_name, source=class_name_source,
        canonicalize=canonicalize)
    self.templates = prompt_engineering.get_prompt_templates(
        prompt_templates, canonicalize=canonicalize)
    self.pp_txt = pp_builder.get_preprocess_fn(pp_txt)
    self.label_key = label_key

    @jax.jit
    def embed_texts(train_state, tokens):
      _, ztxt, _ = predict_fn(train_state, {"labels": tokens})
      return ztxt

    @jax.jit
    def embed_images(train_state, batch):
      zimg, _, _ = predict_fn(train_state, {"image": batch["image"]})
      return zimg

    self._embed_texts = embed_texts
    self._embed_images = embed_images

  def _class_embeddings(self, train_state, devices):
    """[num_classes, D]: prompt-ensembled, renormalized text embeddings."""
    rng = np.random.default_rng(0)
    rows = []
    for name in self.class_names:
      for tmpl in self.templates:
        ex = self.pp_txt.host({"text": tmpl.format(name)}, rng)
        rows.append(ex["labels"])
    tokens = np.stack(rows)  # [C*T, L]
    # Embed in chunks to bound memory.
    chunk = 1024
    embs = []
    for i in range(0, len(tokens), chunk):
      part = tokens[i:i + chunk]
      pad = (-len(part)) % chunk
      if pad:
        part = np.concatenate([part, np.zeros((pad, part.shape[1]),
                                              part.dtype)])
      z = np.asarray(jax.device_get(
          self._embed_texts(train_state, jnp.asarray(part))))
      embs.append(z[:len(tokens[i:i + chunk])])
    z = np.concatenate(embs).reshape(len(self.class_names),
                                     len(self.templates), -1)
    z = z.mean(axis=1)
    z /= np.linalg.norm(z, axis=-1, keepdims=True) + 1e-8
    return z

  def run(self, train_state):
    zcls = self._class_embeddings(train_state, None)  # [C, D]
    ncorrect, nseen = 0, 0
    for _, batch in zip(range(self.steps), self.get_data_iter()):
      mask = np.asarray(
          u.get_local_slice_from_fsarray(batch["_mask"])).astype(bool)
      zimg = np.asarray(u.get_local_slice_from_fsarray(
          self._embed_images(train_state, {"image": batch["image"]})))
      labels = batch[self.label_key]
      if hasattr(labels, "sharding"):
        labels = u.get_local_slice_from_fsarray(labels)
      labels = np.asarray(labels)
      preds = np.argmax(zimg @ zcls.T, axis=-1)
      ncorrect += int(np.sum((preds == labels) & mask))
      nseen += int(mask.sum())
    yield ("prec@1", ncorrect / max(nseen, 1))
