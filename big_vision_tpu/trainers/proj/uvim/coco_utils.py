"""Notebook utilities for inspecting COCO panoptic predictions.

Parity target: reference trainers/proj/uvim/coco_utils.py, which relies on
panopticapi (not in this image). The RGB encoding (id = R + 256 G +
256^2 B) and the color assignment are implemented natively; boundary
overlay falls back from skimage to a simple numpy edge detector.
"""

from __future__ import annotations

import functools
import json
import os

import numpy as np

ROOT = os.environ.get("COCO_DATA_DIR", ".")
PANOPTIC_COCO_CATS_FILE = f"{ROOT}/panoptic_coco_categories.json"


@functools.lru_cache(maxsize=None)
def _coco_panoptic_categories():
  with open(PANOPTIC_COCO_CATS_FILE, "r") as f:
    return tuple(json.load(f))


def id2rgb(ids):
  """Segment id -> RGB (panopticapi convention: id = R+256G+256^2B)."""
  ids = np.asarray(ids)
  return np.stack([ids % 256, (ids // 256) % 256,
                   (ids // 256 ** 2) % 256], -1).astype(np.uint8)


def rgb2id(rgb):
  rgb = np.asarray(rgb, np.int64)
  return rgb[..., 0] + 256 * rgb[..., 1] + 256 ** 2 * rgb[..., 2]


def _distinct_color(rng, base_color, taken):
  """Jitters the category base color until unused (panopticapi style)."""
  color = tuple(base_color)
  while color in taken:
    color = tuple(np.clip(
        np.asarray(base_color) + rng.integers(-40, 41, 3), 0,
        255).astype(int))
  return color


def rgb_panoptic_from_twochannels(twochannels, boundaries=False):
  """(H, W, 2) panoptic map -> (rgb image, segments_info)."""
  semantics = np.asarray(twochannels[..., 0])
  instances = np.asarray(twochannels[..., 1])
  max_instances = int(np.max(instances)) + 1
  merged = semantics * max_instances + instances
  merged = np.where(semantics < 0, semantics, merged)

  categories_list = _coco_panoptic_categories()
  rng = np.random.default_rng(0)
  taken = set()
  segments_info = {}
  rgb = np.zeros((*instances.shape[:2], 3), np.uint8)

  for merged_id in np.unique(merged):
    if merged_id // max_instances > 0:
      category = categories_list[int(merged_id // max_instances) - 1]
      color = _distinct_color(rng, category["color"], taken)
      taken.add(color)
      segment_id = int(rgb2id(np.asarray(color)[None, None])[0, 0])
    else:
      category = {"id": -1, "name": "void", "isthing": False}
      segment_id, color = -1, (0, 0, 0)
    segments_info[segment_id] = {
        "id": segment_id, "color": np.asarray(color),
        "category_id": category["id"], "name": category["name"],
        "isthing": category["isthing"]}
    rgb[merged == merged_id] = color

  if boundaries:
    ids = rgb2id(rgb)
    edge = np.zeros_like(ids, bool)
    edge[1:] |= ids[1:] != ids[:-1]
    edge[:, 1:] |= ids[:, 1:] != ids[:, :-1]
    rgb[edge] = 0
  return rgb, segments_info
