import ml_collections as mlc
import pytest

import big_vision_tpu.configs.common as bvcc


def test_parse_arg_defaults():
  out = bvcc.parse_arg(None, res=224, runlocal=False)
  assert out.res == 224 and out.runlocal is False


def test_parse_arg_values():
  out = bvcc.parse_arg("res=128,runlocal", res=224, runlocal=False)
  assert out.res == 128 and out.runlocal is True


def test_parse_arg_first_positional():
  out = bvcc.parse_arg("128", res=224, runlocal=False)
  assert out.res == 128


def test_parse_arg_bare_flag():
  out = bvcc.parse_arg("runlocal", res=224, runlocal=False)
  assert out.runlocal is True and out.res == 224


def test_parse_arg_false_bool():
  out = bvcc.parse_arg("runlocal=False", runlocal=True)
  assert out.runlocal is False


def test_parse_arg_unknown_raises():
  with pytest.raises(ValueError):
    bvcc.parse_arg("zzz=1", res=224)
  out = bvcc.parse_arg("zzz=1,w=a", lazy=True, res=224)
  assert out.zzz == 1 and out.w == "a"


def test_pack_arg_roundtrip():
  s = bvcc.pack_arg(res=128, mode="fast")
  out = bvcc.parse_arg(s, res=224, mode="slow")
  assert out.res == 128 and out.mode == "fast"


def test_format_str_propagates_references():
  config = mlc.ConfigDict()
  config.res = 256
  config.pp = bvcc.format_str("resize({res})|crop({res})", config)
  config.res = 512
  assert str(config.pp) == "resize(512)|crop(512)"


def test_smoke_config_builds():
  from big_vision_tpu.configs import smoke
  cfg = smoke.get_config()
  assert cfg.model_name == "vit"
  cfg2 = smoke.get_config("res=16,total_steps=2")
  assert cfg2.total_steps == 2


def test_vit_s16_i1k_config_builds():
  from big_vision_tpu.configs import vit_s16_i1k
  cfg = vit_s16_i1k.get_config("runlocal")
  assert cfg.input.batch_size == 32
  assert "decode_jpeg_and_inception_crop(224)" in cfg.input.pp
  assert cfg.model.variant == "S/16"
  cfg = vit_s16_i1k.get_config()
  assert cfg.input.batch_size == 1024
  assert cfg.total_epochs == 90


def test_all_configs_construct():
  """Every config module under configs/ must build via get_config."""
  import importlib
  import pathlib

  root = pathlib.Path(__file__).parent.parent / "big_vision_tpu/configs"
  skip_args = {  # Configs whose get_config takes no arg string.
      "bit_i21k", "proj.scaling_laws.train_vit_g",
      "proj.reward_tune.detection_reward",
  }
  gated = set()  # Video configs raise NotImplementedError by design.
  n = 0
  for path in sorted(root.rglob("*.py")):
    rel = path.relative_to(root).with_suffix("")
    mod_name = ".".join(rel.parts)
    if rel.name in ("__init__", "common", "common_fewshot"):
      continue
    if "transfers.common" in mod_name or mod_name.endswith(".common"):
      continue
    mod = importlib.import_module(f"big_vision_tpu.configs.{mod_name}")
    if not hasattr(mod, "get_config"):
      continue
    try:
      c = (mod.get_config() if mod_name in skip_args
           else mod.get_config(""))
    except NotImplementedError:
      gated.add(mod_name)  # e.g. video transfers needing a data loader
      continue
    assert c is not None, mod_name
    n += 1
  assert n >= 55, f"only {n} configs constructed"
  assert all("cap" in g or "qa" in g for g in gated), gated
