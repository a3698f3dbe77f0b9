"""Shared utilities for the FlexiViT trainers.

Parity target: reference trainers/proj/flexi/common.py.
"""

from __future__ import annotations

import functools
import itertools

import numpy as np


def mkrng(xid, wid, step):
  """Deterministic per-(experiment, work-unit, step) host RNG."""
  return np.random.default_rng((max(xid, 0), max(wid, 0), max(step, 0)))


def mkprob(x):
  if x is None:
    return x
  return np.array(x) / np.sum(x)


def choice(values, ratios, rng=None):
  rng = rng or np.random.default_rng()
  return rng.choice(values, p=mkprob(ratios))


def mkpredictfns(predict_fn, config, template="predict_{x}"):
  """One named predict_fn per combination of flexi arg values."""
  all_combinations = [dict(comb) for comb in itertools.product(
      *[[(arg, val) for val in config[arg].v] for arg in config])]
  return {
      template.format(x="_".join(f"{k}={v}" for k, v in kw.items())):
          functools.partial(predict_fn, **kw)
      for kw in all_combinations}
