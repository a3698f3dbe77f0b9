"""TFDS-style split expression parsing for native datasets.

The transfer configs address data with expressions like
  "train"                      one split
  "train+restval"              union
  "train + validation[:-10240]"  union with absolute slicing
  "train[:98%]" / "train[-10%:]" percent slicing (TFDS closest-int rounding)

Parity target: the subset of tfds split syntax the reference configs use
(reference big_vision/configs/proj/paligemma/transfers/*.py); weighted
splits and cross-validation syntax are not used there and not supported.
"""

from __future__ import annotations

import re

_SLICE_RE = re.compile(
    r"^(?P<name>[\w./:-]+?)"
    r"(?:\[(?P<start>-?\d+%?)?:(?P<stop>-?\d+%?)?\])?$")


def _resolve(bound, n):
  """An absolute or percent bound -> absolute index (TFDS rounding)."""
  if bound is None or bound == "":
    return None
  if bound.endswith("%"):
    p = int(bound[:-1])
    if not -100 <= p <= 100:
      raise ValueError(f"Percent out of range: {bound!r}")
    return int(round(n * p / 100))
  return int(bound)


def parse(expr):
  """Split expression -> list of (split_name, start_or_None, stop_or_None).

  Bounds stay symbolic ("25%", "-10240") until the split size is known;
  use `materialize` to turn them into a range.
  """
  parts = []
  for piece in str(expr).split("+"):
    piece = piece.strip()
    if not piece:
      raise ValueError(f"Empty piece in split expression {expr!r}")
    m = _SLICE_RE.match(piece)
    if not m:
      raise ValueError(f"Cannot parse split piece {piece!r} of {expr!r}")
    parts.append((m.group("name"), m.group("start"), m.group("stop")))
  return parts


def materialize(piece, n):
  """(name, start, stop) + split size -> (name, abs_start, abs_stop)."""
  name, start, stop = piece
  start = _resolve(start, n)
  stop = _resolve(stop, n)
  start = 0 if start is None else (start + n if start < 0 else start)
  stop = n if stop is None else (stop + n if stop < 0 else stop)
  start = max(0, min(start, n))
  stop = max(start, min(stop, n))
  return name, start, stop
