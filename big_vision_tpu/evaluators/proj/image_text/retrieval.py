"""Image<->text retrieval evaluator (COCO/Flickr-style recall@K).

Parity target: reference evaluators/proj/image_text/retrieval.py +
image_text_retrieval.py. Embeds the whole eval split through the jit
predict_fn (multi-host exact via the _mask contract), then computes both
retrieval directions on host. Multiple captions per image are handled via
an `image_id` key: text->image is correct if the retrieved image matches;
image->text if ANY caption of the image is in the top K.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.evaluators import common

API = "jit"


@functools.cache
def get_embed_fns(predict_fn):
  @jax.jit
  def embed_images(train_state, batch):
    zimg, _, _ = predict_fn(train_state, {"image": batch["image"]})
    return zimg

  @jax.jit
  def embed_texts(train_state, batch):
    _, ztxt, _ = predict_fn(train_state, {"labels": batch["labels"]})
    return ztxt
  return embed_images, embed_texts


def recall_at(ranks, ks):
  return {f"recall@{k}": float(np.mean(ranks < k)) for k in ks}


def text_to_image_ranks(sims, txt2img):
  """sims: [n_txt, n_img]; rank of the correct image per text."""
  order = np.argsort(-sims, axis=1)
  ranks = np.empty(sims.shape[0], np.int64)
  for i, correct in enumerate(txt2img):
    ranks[i] = int(np.nonzero(order[i] == correct)[0][0])
  return ranks


def image_to_text_ranks(sims, txt2img):
  """sims: [n_txt, n_img]; best rank of any matching caption per image."""
  order = np.argsort(-sims.T, axis=1)  # [n_img, n_txt]
  n_img = sims.shape[1]
  ranks = np.full(n_img, sims.shape[0], np.int64)
  for img in range(n_img):
    matching = np.nonzero(txt2img == img)[0]
    if len(matching):
      pos = np.nonzero(np.isin(order[img], matching))[0]
      ranks[img] = int(pos[0])
  return ranks


class Evaluator:
  """Expects batches with 'image', 'labels' (tokenized text) and an
  'image/id'-style key identifying which image a caption belongs to."""

  def __init__(self, predict_fn, id_key="image/id", ks=(1, 5, 10), **kw):
    kw.setdefault("keep_on_cpu", ())
    self.get_data_iter, self.steps = common.eval_input_pipeline(**kw)
    self.embed_images, self.embed_texts = get_embed_fns(predict_fn)
    self.id_key = id_key
    self.ks = tuple(ks)

  def run(self, train_state):
    zimgs, ztxts, ids = [], [], []
    for _, batch in zip(range(self.steps), self.get_data_iter()):
      mask = np.asarray(
          u.get_local_slice_from_fsarray(batch["_mask"])).astype(bool)
      zi = np.asarray(u.get_local_slice_from_fsarray(
          self.embed_images(train_state, batch)))[mask]
      zt = np.asarray(u.get_local_slice_from_fsarray(
          self.embed_texts(train_state, batch)))[mask]
      bid = batch[self.id_key]
      if hasattr(bid, "sharding"):
        bid = u.get_local_slice_from_fsarray(bid)
      ids.append(np.asarray(bid)[mask])
      zimgs.append(zi)
      ztxts.append(zt)
    zimg = np.concatenate(zimgs)
    ztxt = np.concatenate(ztxts)
    ids = np.concatenate(ids)

    # Deduplicate images by id (each caption row carries a full image).
    unique_ids, first_idx = np.unique(ids, return_index=True)
    zimg_unique = zimg[first_idx]
    id_to_pos = {i: p for p, i in enumerate(unique_ids)}
    txt2img = np.asarray([id_to_pos[i] for i in ids])

    sims = ztxt @ zimg_unique.T  # [n_txt, n_img]
    for name, value in recall_at(
        text_to_image_ranks(sims, txt2img), self.ks).items():
      yield (f"txt2img/{name}", value)
    for name, value in recall_at(
        image_to_text_ranks(sims, txt2img), self.ks).items():
      yield (f"img2txt/{name}", value)
