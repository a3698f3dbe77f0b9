"""Config helpers: typed string args and reference interpolation.

Parity target: reference big_vision/configs/common.py (parse_arg :29,
pack_arg/arg :139-148, format_str :158). Configs are plain-Python
`get_config(arg)` factories returning ml_collections.ConfigDict.
"""

from __future__ import annotations

import string as _string
from functools import reduce

import ml_collections as mlc


def _bare_to_kv(token, schema):
  """Expands a single bare value: a schema name (or empty schema) means that
  bool flag is True; anything else binds to the FIRST schema entry."""
  if token in schema or not schema:
    return f"{token}=True"
  return f"{next(iter(schema))}={token}"


def _split_kv(arg):
  """',:'-language split; a '=???'-less item is an implicit bool True."""
  kv = {}
  for piece in arg.split(","):
    if not piece:
      continue
    name, sep, val = piece.partition("=")
    kv[name] = val if sep else "True"
  return kv


def parse_arg(arg, lazy=False, **spec):
  """Parses ':res=128,runlocal'-style config args with typed defaults."""
  schema = {k: _type_with_default(v) for k, v in spec.items()}
  text = arg or ""
  if text and "," not in text and "=" not in text:
    text = _bare_to_kv(text, schema)
  kv = _split_kv(text)

  out = mlc.ConfigDict(type_safe=False)
  for name, (default, cast) in schema.items():
    out[name] = cast(kv.pop(name)) if name in kv else default

  if kv and not lazy:
    raise ValueError(f"Unhandled config args remain: {kv}")
  for extra, text_val in kv.items():
    out[extra] = autotype(text_val)
  return out


def _strict_bool(x):
  assert x.lower() in {"true", "false", ""}, f"Bad bool string {x!r}"
  return x.lower() == "true"


def _type_with_default(v):
  if isinstance(v, (tuple, list)):
    assert len(v) == 2 and isinstance(v[1], type), (
        "Pass (default, type); collection-typed args unsupported (',' is the "
        "delimiter)")
    default, cast = v
    return default, cast
  if isinstance(v, bool):
    return v, _strict_bool
  return v, type(v)


def autotype(x):
  assert isinstance(x, str)
  low = x.lower()
  if low in ("true", "false"):
    return low == "true"
  for cast in (int, float):
    try:
      return cast(x)
    except ValueError:
      pass
  return x


def pack_arg(**kw):
  parts = []
  for k, v in kw.items():
    text = f"{v}"
    assert "," not in text, f"Can't use ',' in config_arg value: {v}"
    parts.append(f"{k}={text}")
  return ",".join(parts)


def arg(**kw):
  """add(**arg(res=256), lr=0.1) — pass config_arg along with its fields."""
  return {"config_arg": pack_arg(**kw), **kw}


def _field_ref(config, name):
  *parents, leaf = name.split(".")
  return reduce(getattr, parents, config).get_ref(leaf)


def format_str(format_string, config):
  """Formats '{res}'-style placeholders as *references* into the config, so
  later edits to the referenced fields propagate into the string."""
  chunks = []
  for literal, name, spec, conv in _string.Formatter().parse(format_string):
    assert not spec and not conv, (spec, conv)
    chunks.append(literal)
    if name:
      # .to_str() yields a lazy FieldReference; summing keeps the whole
      # result lazy, so it re-renders when the referenced fields change.
      chunks.append(_field_ref(config, name).to_str())
  return reduce(lambda acc, part: acc + part, chunks, "")
