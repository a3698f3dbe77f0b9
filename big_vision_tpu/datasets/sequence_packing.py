"""Sequence packing: combine short examples into fixed-length rows.

The reference's version raises "Not implemented in OSS yet."
(datasets/sequence_packing.py:30-77); this is a real implementation. For
each packed key `k` the output carries:

  k                 int32[L]  packed tokens
  k_segmentation    int32[L]  1-based example id within the row (0 = pad)
  k_position        int32[L]  position within the original example

Greedy first-fit over a small open-row pool: rows are emitted when no
incoming example fits, keeping utilization high with O(pool) state.
Multiple keys pack in lockstep (same segmentation layout per key,
independent lengths per key like the t5/MaxText packer).
"""

from __future__ import annotations

import numpy as np


class _Row:

  def __init__(self, key2length):
    self.parts = {k: [] for k in key2length}
    self.used = {k: 0 for k in key2length}
    self.n_examples = 0
    self.key2length = key2length

  def fits(self, ex):
    return all(self.used[k] + len(np.atleast_1d(ex[k])) <= l
               for k, l in self.key2length.items())

  def add(self, ex):
    self.n_examples += 1
    for k in self.key2length:
      v = np.atleast_1d(np.asarray(ex[k]))
      self.parts[k].append(v)
      self.used[k] += len(v)

  def finish(self):
    out = {}
    for k, length in self.key2length.items():
      toks = np.zeros(length, np.int32)
      seg = np.zeros(length, np.int32)
      pos = np.zeros(length, np.int32)
      ofs = 0
      for i, part in enumerate(self.parts[k]):
        n = len(part)
        toks[ofs:ofs + n] = part
        seg[ofs:ofs + n] = i + 1
        pos[ofs:ofs + n] = np.arange(n)
        ofs += n
      out[k] = toks
      out[f"{k}_segmentation"] = seg
      out[f"{k}_position"] = pos
    return out


def pack_examples(stream, key2length, pool_size=8):
  """Packs an iterator of example dicts; yields packed row dicts.

  Examples longer than the target length are truncated. Non-packed keys
  are dropped (packing mixes examples, so per-example metadata would be
  meaningless).
  """
  open_rows = []

  def truncate(ex):
    return {k: np.atleast_1d(np.asarray(ex[k]))[:l]
            for k, l in key2length.items()}

  for ex in stream:
    ex = truncate(ex)
    for row in open_rows:
      if row.fits(ex):
        row.add(ex)
        break
    else:
      if len(open_rows) >= pool_size:
        # Evict the fullest row to bound memory/latency.
        fullest = max(range(len(open_rows)),
                      key=lambda i: sum(open_rows[i].used.values()))
        yield open_rows.pop(fullest).finish()
      row = _Row(key2length)
      row.add(ex)
      open_rows.append(row)
  for row in open_rows:
    yield row.finish()


def pack_dataset(stream, key2length, keys=None):
  """Reference-compatible entry point (ref sequence_packing.py:30)."""
  if keys is not None:
    key2length = {k: key2length[k] if isinstance(key2length, dict)
                  else key2length for k in keys}
  return pack_examples(stream, key2length)
