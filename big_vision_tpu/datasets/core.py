"""DataSource API: per-process example streams, no tf.data anywhere.

A DataSource owns a (possibly remote) dataset and this process's split of
it. The input pipeline pulls raw example dicts (bytes / numpy) from it on
host threads. Parity target: reference big_vision/datasets/core.py:21-77,
with tf.data replaced by plain python iterators feeding the two-phase pp.

Dispatch: `get(name, **kw)`:
  * "synthetic"       -> datasets/synthetic.py (generated data, benchmarks)
  * "arrays"          -> datasets/arrays.py (in-memory dicts, tests)
  * "jsonl"           -> datasets/jsonl.py
  * "imagefolder"     -> datasets/imagefolder.py (class-per-dir trees)
  * "bv:module"       -> custom module under big_vision_tpu.datasets
  * anything else     -> TFDS via datasets/tfds.py (requires the
                         tensorflow_datasets package; absent in this image)
"""

from __future__ import annotations

import importlib
import logging
from typing import Iterator

import jax
import numpy as np


class DataSource:
  """Interface; subclasses provide this process's shard of the data."""

  # Total number of examples across all processes.
  total_examples: int

  def num_examples_per_process(self) -> int:
    """Examples owned by this process (even_splits semantics)."""
    raise NotImplementedError

  def get_examples(self, *, ordered: bool, seed: int = 0,
                   epoch: int = 0) -> Iterator[dict]:
    """Yields this process's examples once (one epoch).

    ordered=True: deterministic order (eval). ordered=False: shuffled with
    `seed`/`epoch` folded in (train; pipeline adds a shuffle buffer on top).
    Each example dict should carry a stable "_id" int64 where possible.
    """
    raise NotImplementedError


def even_split_bounds(n, k, i):
  """Start/stop of split i of k over n items (TFDS even_splits semantics)."""
  base, rem = divmod(n, k)
  start = i * base + min(i, rem)
  stop = start + base + (1 if i < rem else 0)
  return start, stop


def process_split(n, process_index=None, process_count=None):
  """This process's [start, stop) over an n-example dataset."""
  pi = jax.process_index() if process_index is None else process_index
  pc = jax.process_count() if process_count is None else process_count
  return even_split_bounds(n, pc, pi)


def get(name, **kw):
  """Instantiates a DataSource by name (see module docstring)."""
  if name.startswith("bv:"):
    mod = importlib.import_module(f"big_vision_tpu.datasets.{name[3:]}")
    return mod.DataSource(**kw)
  builtin = {
      "synthetic": "big_vision_tpu.datasets.synthetic",
      "arrays": "big_vision_tpu.datasets.arrays",
      "jsonl": "big_vision_tpu.datasets.jsonl",
      "imagefolder": "big_vision_tpu.datasets.imagefolder",
  }
  if name in builtin:
    mod = importlib.import_module(builtin[name])
    return mod.DataSource(**kw)
  # Datasets produced by big_vision_tpu.datasets.builders (the TF-free
  # replacement for the reference's custom TFDS builders) take priority
  # over a tfds installation when present on disk — but only when the
  # built directory can actually serve the requested split, so a partial
  # or stale build falls through to tfds instead of silently changing
  # what a run reads.
  from big_vision_tpu.datasets import built
  if built.exists(name, kw.get("data_dir")):
    if built.has_split(name, kw.get("split"), kw.get("data_dir")):
      logging.info("datasets.get(%r): using built dataset at %s",
                   name, built.dataset_dir(name, kw.get("data_dir")))
      return built.DataSource(name, **kw)
    logging.warning(
        "datasets.get(%r): built dataset exists but lacks split %r; "
        "falling through to tfds", name, kw.get("split"))
  from big_vision_tpu.datasets import tfds as tfds_mod
  logging.info("datasets.get(%r): using tfds source", name)
  return tfds_mod.DataSource(name, **kw)


def stable_id(key) -> np.int64:
  """64-bit stable hash of a string/bytes key (for example identity)."""
  import hashlib
  if isinstance(key, str):
    key = key.encode()
  h = hashlib.sha256(key).digest()
  return np.int64(int.from_bytes(h[:8], "little", signed=True))
