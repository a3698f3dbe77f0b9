"""Evaluator driver and shared eval input plumbing.

Parity target: reference big_vision/evaluators/common.py. Every evaluator is
a class `Evaluator(predict_fn, **cfg)` with `.run(train_state)` yielding
(metric_name, value); the trainer instantiates them from config.evals via
`from_config` and namespaces metrics by prefix. All evaluators use the
jit/global-array API (API='jit' everywhere; no pmap path exists here).
"""

from __future__ import annotations

import dataclasses
import functools
import importlib
import json
import os
from typing import Any, Callable

import flax
import jax
import numpy as np

import big_vision_tpu.input_pipeline as input_pipeline
import big_vision_tpu.utils as u


def _normalize_spec(name, cfg, config, get_steps, devices):
  """One eval spec -> (module, pred_key, pred_kw, prefix, logsteps, kw)."""
  cfg = cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg)
  meta = {
      "module": cfg.pop("type", name),
      "pred_key": cfg.pop("pred", "predict"),
      "pred_kw": cfg.pop("pred_kw", None),
      "prefix": cfg.pop("prefix", f"{name}/"),
  }
  cfg.pop("skip_first", None)
  meta["logsteps"] = get_steps("log", cfg)
  for typ in ("steps", "epochs", "examples", "percent"):
    cfg.pop(f"log_{typ}", None)
  # Batch-size resolution ladder: per-eval > eval-global > train.
  fallbacks = (config.get("batch_size_eval"),
               config.get("input.batch_size"), config.get("batch_size"))
  cfg["batch_size"] = cfg.get("batch_size") or next(
      (b for b in fallbacks if b), None)
  if devices is not None:
    cfg["devices"] = devices
  return meta, cfg


def from_config(config, predict_fns, write_note=lambda s: s,
                get_steps=lambda key, cfg: cfg[f"{key}_steps"],
                devices=None):
  """Instantiates [(name, evaluator, logsteps, prefix), ...] from config."""
  evaluators = []
  for name, raw in config.get("evals", {}).items():
    write_note(name)
    meta, kw = _normalize_spec(name, raw, config, get_steps, devices)
    mod = importlib.import_module(
        f"big_vision_tpu.evaluators.{meta['module']}")
    if meta["pred_key"] not in predict_fns:
      raise ValueError(f"Unknown predict_fn {meta['pred_key']!r}; "
                       f"have: {list(predict_fns)}")
    predict_fn = predict_fns[meta["pred_key"]]
    if meta["pred_kw"] is not None:
      predict_fn = CacheablePartial(predict_fn,
                                    flax.core.freeze(meta["pred_kw"]))
    evaluators.append((name, mod.Evaluator(predict_fn, **kw),
                       meta["logsteps"], meta["prefix"]))
  return evaluators


@dataclasses.dataclass(frozen=True, eq=True)
class CacheablePartial:
  """Hashable partial so jit caches persist across evaluator instances."""
  fn: Callable[..., Any]
  kwargs: Any  # flax FrozenDict

  def __call__(self, *args, **kwargs):
    bound = functools.partial(self.fn, **self.kwargs)
    return bound(*args, **kwargs)


_PIPELINE_CACHE = {}


def eval_input_pipeline(data, pp_fn, batch_size, devices, *,
                        keep_on_cpu=(), cache="pipeline", prefetch=1,
                        warmup=False):
  """(get_data_iter, steps) for an eval dataset, with pipeline caching.

  cache levels (reference evaluators/common.py:128-134), cheap to rich:
  "none" rebuilds everything per run; "pipeline" reuses the constructed
  pipeline across evaluator instances keyed by its config; "raw_data"
  additionally memoizes the raw (pre-pp) examples in host RAM and re-runs
  pp each eval; "final_data" memoizes the realized global batches (small
  eval sets).
  """
  del warmup
  cache = (cache or "none").lower()
  assert cache in ("none", "pipeline", "raw_data", "final_data"), cache
  key = (json.dumps(data, sort_keys=True, default=str), pp_fn, batch_size,
         tuple(keep_on_cpu), cache)
  if cache != "none" and key in _PIPELINE_CACHE:
    return _PIPELINE_CACHE[key]

  make_iter, steps = input_pipeline.make_for_inference(
      dict(data), pp=pp_fn, batch_size=batch_size, devices=devices,
      keep_on_cpu=keep_on_cpu, cache_raw=cache == "raw_data")

  if cache == "final_data":
    @functools.lru_cache(maxsize=1)
    def realized():
      return list(make_iter())
    get_iter = lambda: iter(realized())
  else:
    get_iter = make_iter

  result = (get_iter, steps)
  if cache != "none":
    _PIPELINE_CACHE[key] = result
  return result


def split_batch(batch):
  """(device_part, host_part): jitted eval fns must only see jax Arrays."""
  dev = {k: v for k, v in batch.items() if isinstance(v, jax.Array)}
  host = {k: v for k, v in batch.items() if k not in dev}
  return dev, host


def process_sum(tree):
  """Sums pytrees over processes (identity in single-process runs)."""
  if jax.process_count() == 1:
    return tree
  from jax.experimental import multihost_utils
  return jax.tree.map(lambda x: np.sum(x, axis=0),
                      multihost_utils.process_allgather(tree))


def multiprocess_write_json(path, records):
  """Each process contributes `records`; process 0 writes the merged json.

  Returns the merged records (on every process), like the reference
  (evaluators/common.py:208), so callers can score them on host 0.
  """
  if jax.process_count() == 1:
    merged = list(records)
  else:
    # Gather variable-length json blobs: pad byte arrays to the global max.
    from jax.experimental import multihost_utils
    blob = np.frombuffer(json.dumps(list(records)).encode(), np.uint8)
    n = int(np.max(multihost_utils.process_allgather(
        np.asarray(len(blob)))))
    padded = np.zeros(n + 1, np.uint8)
    padded[:len(blob)] = blob
    padded[-1] = 0
    lens = multihost_utils.process_allgather(np.asarray(len(blob)))
    blobs = multihost_utils.process_allgather(padded)
    merged = []
    for row, ln in zip(np.atleast_2d(blobs), np.atleast_1d(lens)):
      merged.extend(json.loads(bytes(row[:int(ln)]).decode()))
  if path and jax.process_index() == 0:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
      json.dump(merged, f)
  u.sync()
  return merged


def resolve_outfile(outfile, split="", **kw):
  """Expands {workdir}/{split}/... placeholders; None if not resolvable.

  Ref: evaluators/common.py:177. Skips (returns None) when the template
  needs a workdir but none was given — common for local/smoke runs.
  """
  if not outfile:
    return None
  workdir = None
  try:
    from absl import flags
    if flags.FLAGS.is_parsed():
      workdir = getattr(flags.FLAGS, "workdir", None)
  except Exception:  # pylint: disable=broad-except
    pass
  if "{workdir}" in outfile and not workdir:
    return None
  safe_split = "".join("_" if c in "[]%:" else c for c in (split or ""))
  return outfile.format(workdir=workdir, split=safe_split,
                        step=getattr(u.chrono, "prev_step", None), **kw)
