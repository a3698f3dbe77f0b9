"""Synthetic DataSource: procedurally generated images/labels.

Used by benchmarks and smoke configs; generates either raw HWC uint8 arrays
(`encoded=False`) or JPEG bytes (`encoded=True`, exercises the host decode
path like a real dataset would).
"""

from __future__ import annotations

import functools
import io

import numpy as np

from big_vision_tpu.datasets import core


@functools.lru_cache(maxsize=None)  # one entry per unique image: must never
def _jpeg_bytes(seed, h, w):        # thrash, re-encoding costs ~10ms/image
  from PIL import Image
  rng = np.random.default_rng(seed)
  arr = rng.integers(0, 255, (h, w, 3), np.uint8)
  buf = io.BytesIO()
  Image.fromarray(arr).save(buf, format="JPEG", quality=90)
  return buf.getvalue()


class DataSource(core.DataSource):

  def __init__(self, *, n=1024, num_classes=1000, h=256, w=256,
               encoded=True, unique_images=64, split=None):
    del split
    self.total_examples = n
    self.num_classes = num_classes
    self.h, self.w = h, w
    self.encoded = encoded
    self.unique_images = unique_images
    self._start, self._stop = core.process_split(n)

  def num_examples_per_process(self):
    return self._stop - self._start

  def _example(self, i):
    label = np.int32(i % self.num_classes)
    if self.encoded:
      img = _jpeg_bytes(int(i) % self.unique_images, self.h, self.w)
    else:
      rng = np.random.default_rng(int(i) % self.unique_images)
      img = rng.integers(0, 255, (self.h, self.w, 3), np.uint8)
    return {"image": img, "label": label, "_id": np.int64(i)}

  def get_examples(self, *, ordered, seed=0, epoch=0):
    idx = np.arange(self._start, self._stop)
    if not ordered:
      rng = np.random.default_rng((seed, epoch))
      idx = rng.permutation(idx)
    for i in idx:
      yield self._example(i)
