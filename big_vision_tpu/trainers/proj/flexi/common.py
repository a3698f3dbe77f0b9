"""Shared utilities for the FlexiViT trainers.

Behavior parity: reference trainers/proj/flexi/common.py (host-side RNG
keyed by (experiment, work-unit, step), weighted choice of flexi arg
values, and the per-combination dict of jitted predict_fns).
"""

from __future__ import annotations

import functools
import itertools

import numpy as np


def mkrng(xid, wid, step):
  """Deterministic host RNG; ids are capped at 0 (local runs use -1)."""
  return np.random.default_rng((*map(lambda v: max(v, 0), (xid, wid)),
                                max(step, 0)))


def mkprob(weights):
  """Normalizes a weight list into a probability vector (None passthrough)."""
  if weights is None:
    return None
  return np.divide(weights, np.sum(weights, dtype=float))


def choice(values, ratios, rng=None):
  """Samples one of `values` with (unnormalized) `ratios` as weights."""
  sampler = np.random.default_rng() if rng is None else rng
  return sampler.choice(values, p=mkprob(ratios))


def mkpredictfns(predict_fn, config, template="predict_{x}"):
  """One named predict_fn per combination of flexi arg values.

  For flexi args a=[1,2], b=[10,20] this yields four entries named
  "predict_a=1_b=10" etc., each a partial of predict_fn — so each
  combination jits (and caches) separately, avoiding shape retraces.
  """
  arg_names = list(config)
  fns = {}
  for combo in itertools.product(*(config[a].v for a in arg_names)):
    kw = dict(zip(arg_names, combo))
    label = "_".join(f"{a}={v}" for a, v in kw.items())
    fns[template.format(x=label)] = functools.partial(predict_fn, **kw)
  return fns
