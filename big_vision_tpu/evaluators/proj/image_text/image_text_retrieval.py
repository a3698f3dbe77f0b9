"""Retrieval recall@k from a distance matrix (API-parity helper module).

Parity target: reference evaluators/proj/image_text/image_text_retrieval.py
— pure-numpy functions consumed by the retrieval evaluator. The evaluator
in this framework (retrieval.py) has its own rank math; these wrappers
expose the reference's distance-matrix API on top of it.
"""

from __future__ import annotations

import numpy as np

RECALL_THRESHOLDS = (1, 5, 10)


def text_to_image_retrieval_eval(dist_matrix, text_image_correspondence):
  """dist_matrix: [N_IMAGES, N_TEXTS]; correspondence: text -> image row."""
  per_text_ranks = dist_matrix.argsort(axis=0)
  text_image_correspondence = np.array(text_image_correspondence)

  def recall_at(k):
    wins = per_text_ranks[:k, :] == text_image_correspondence[None]
    return wins.any(axis=0).mean()

  return {f"Recall@{k}": recall_at(k) for k in RECALL_THRESHOLDS}


def image_to_text_retrieval_eval(dist_matrix, text_image_correspondence):
  """dist_matrix: [N_IMAGES, N_TEXTS]; one hit per image suffices."""
  per_image_ranks = dist_matrix.argsort(axis=1)
  text_image_correspondence = np.array(text_image_correspondence)

  def recall_at(k):
    wins = (text_image_correspondence[per_image_ranks[:, :k]]
            == np.arange(dist_matrix.shape[0])[:, None])
    return wins.any(axis=1).mean()

  return {f"Recall@{k}": recall_at(k) for k in RECALL_THRESHOLDS}
