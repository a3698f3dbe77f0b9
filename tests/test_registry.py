import pytest

from big_vision_tpu.registry import Registry, parse_name


def test_parse_bare_name():
  assert parse_name("multiclass") == ("multiclass", (), {})


def test_parse_dotted():
  assert parse_name("shardings.fsdp") == ("shardings.fsdp", (), {})


def test_parse_call():
  name, args, kwargs = parse_name("resize(256, method='bilinear')")
  assert name == "resize"
  assert args == (256,)
  assert kwargs == {"method": "bilinear"}


def test_parse_dotted_call_with_literals():
  name, args, kwargs = parse_name("a.b([1, 2], x=(3, 'y'), z=None)")
  assert name == "a.b"
  assert args == ([1, 2],)
  assert kwargs == {"x": (3, "y"), "z": None}


def test_parse_rejects_expressions():
  with pytest.raises(ValueError):
    parse_name("f(1+2)")


def test_register_lookup_roundtrip():
  @Registry.register("test.thing")
  def make_thing(a, b=10):
    return a + b

  assert Registry.knows("test.thing")
  assert Registry.knows("test.thing(2)")
  assert not Registry.knows("test.other")
  assert Registry.lookup("test.thing(2)")() == 12
  assert Registry.lookup("test.thing(2, b=100)")() == 102
  assert Registry.lookup("test.thing", kwargs_extra={"b": 1})(a=5) == 6


def test_register_duplicate_raises():
  Registry.register("test.dup")(lambda: 1)
  with pytest.raises(KeyError):
    Registry.register("test.dup")(lambda: 2)
  Registry.register("test.dup", replace=True)(lambda: 3)
  assert Registry.lookup("test.dup")() == 3


def test_every_module_imports():
  """Import sweep over the whole package: no stale imports anywhere
  (configs, trainers, evaluators, pp, models, tools)."""
  import importlib
  import pathlib

  import big_vision_tpu

  root = pathlib.Path(big_vision_tpu.__file__).parent
  failures = []
  for p in root.rglob("*.py"):
    mod = "big_vision_tpu." + str(
        p.relative_to(root))[:-3].replace("/", ".")
    if mod.endswith("__init__"):
      mod = mod[: -len(".__init__")]
    try:
      importlib.import_module(mod)
    except Exception as e:  # noqa: BLE001
      failures.append((mod, repr(e)))
  assert not failures, failures
