"""Config helpers: typed string args and reference interpolation.

Parity target: reference big_vision/configs/common.py (parse_arg :29,
pack_arg/arg :139-148, format_str :158). Configs are plain-Python
`get_config(arg)` factories returning ml_collections.ConfigDict.
"""

from __future__ import annotations

import ml_collections as mlc


def parse_arg(arg, lazy=False, **spec):
  """Parses ':res=128,runlocal'-style config args with typed defaults.

  Single bare value rules: a name from the spec means that bool flag True;
  otherwise the value binds to the first spec entry.
  """
  arg = arg or ""
  spec = {k: _type_with_default(v) for k, v in spec.items()}
  result = mlc.ConfigDict(type_safe=False)

  if arg and "," not in arg and "=" not in arg:
    if arg in spec or not spec:
      arg = f"{arg}=True"
    else:
      arg = f"{next(iter(spec))}={arg}"

  raw_kv = {}
  for item in arg.split(","):
    if not item:
      continue
    key, _, val = item.partition("=")
    raw_kv[key] = val if "=" in item else "True"

  for name, (default, type_fn) in spec.items():
    val = raw_kv.pop(name, None)
    result[name] = type_fn(val) if val is not None else default

  if raw_kv:
    if lazy:
      for k, v in raw_kv.items():
        result[k] = autotype(v)
    else:
      raise ValueError(f"Unhandled config args remain: {raw_kv}")
  return result


def _type_with_default(v):
  if isinstance(v, bool):
    def strict_bool(x):
      assert x.lower() in {"true", "false", ""}, f"Bad bool string {x!r}"
      return x.lower() == "true"
    return (v, strict_bool)
  if isinstance(v, (tuple, list)):
    assert len(v) == 2 and isinstance(v[1], type), (
        "Pass (default, type); collection-typed args unsupported (',' is the "
        "delimiter)")
    return (v[0], v[1])
  return (v, type(v))


def autotype(x):
  assert isinstance(x, str)
  if x.lower() in {"true", "false"}:
    return x.lower() == "true"
  try:
    return int(x)
  except ValueError:
    try:
      return float(x)
    except ValueError:
      return x


def pack_arg(**kw):
  for v in kw.values():
    assert "," not in f"{v}", f"Can't use ',' in config_arg value: {v}"
  return ",".join(f"{k}={v}" for k, v in kw.items())


def arg(**kw):
  """add(**arg(res=256), lr=0.1) — pass config_arg along with its fields."""
  return {"config_arg": pack_arg(**kw), **kw}


def _field_ref(config, name):
  node = config
  parts = name.split(".")
  for p in parts[:-1]:
    node = getattr(node, p)
  return node.get_ref(parts[-1])


def format_str(format_string, config):
  """Formats '{res}'-style placeholders as *references* into the config, so
  later edits to the referenced fields propagate into the string."""
  import string
  output = ""
  for literal, name, spec, conv in string.Formatter().parse(format_string):
    assert not spec and not conv, (spec, conv)
    output += literal
    if name:
      output += _field_ref(config, name).to_str()
  return output
