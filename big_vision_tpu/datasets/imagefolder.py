"""Image-folder DataSource: root/<class_name>/<image files>.

The on-disk layout torchvision calls ImageFolder; classes are sorted dir
names. Yields raw encoded bytes + integer label.
"""

from __future__ import annotations

import os

import numpy as np

from big_vision_tpu.datasets import core

_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


class DataSource(core.DataSource):

  def __init__(self, root, split=None):
    del split
    classes = sorted(
        d for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d)))
    self.class_names = classes
    self.files = []
    for li, cls in enumerate(classes):
      cdir = os.path.join(root, cls)
      for fn in sorted(os.listdir(cdir)):
        if fn.lower().endswith(_EXTS):
          self.files.append((os.path.join(cdir, fn), li))
    self.total_examples = len(self.files)
    self._start, self._stop = core.process_split(self.total_examples)

  def num_examples_per_process(self):
    return self._stop - self._start

  def get_examples(self, *, ordered, seed=0, epoch=0):
    idx = np.arange(self._start, self._stop)
    if not ordered:
      rng = np.random.default_rng((seed, epoch))
      idx = rng.permutation(idx)
    for i in idx:
      path, label = self.files[int(i)]
      with open(path, "rb") as f:
        img = f.read()
      yield {"image": img, "label": np.int32(label),
             "_id": core.stable_id(path)}
