"""JSONL DataSource: one JSON object per line, optional image-file loading.

Parity target: reference big_vision/datasets/jsonl.py (url-cached jsonl
with `fname` image loading relative to `fopen_keys` roots).
"""

from __future__ import annotations

import json
import os

import numpy as np

from big_vision_tpu.datasets import core


class DataSource(core.DataSource):
  """fname: path to .jsonl; fopen_keys: {key: dirname} values to read as
  bytes (e.g. {"image": "/data/images"})."""

  def __init__(self, fname, *, fopen_keys=None, start=0, stop=float("inf"),
               split=None):
    del split
    with open(fname) as f:
      rows = [json.loads(line) for line in f]
    rows = rows[start:None if stop == float("inf") else int(stop)]
    self.rows = rows
    self.fopen_keys = dict(fopen_keys or {})
    self.total_examples = len(rows)
    self._start, self._stop = core.process_split(len(rows))

  def num_examples_per_process(self):
    return self._stop - self._start

  def _example(self, i):
    ex = dict(self.rows[i])
    for key, root in self.fopen_keys.items():
      path = os.path.join(root, ex[key]) if root else ex[key]
      with open(path, "rb") as f:
        ex[key] = f.read()
    ex.setdefault("_id", np.int64(i))
    return ex

  def get_examples(self, *, ordered, seed=0, epoch=0):
    idx = np.arange(self._start, self._stop)
    if not ordered:
      rng = np.random.default_rng((seed, epoch))
      idx = rng.permutation(idx)
    for i in idx:
      yield self._example(int(i))
