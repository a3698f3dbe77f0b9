"""Reference big_vision CONFIG FILES drive this repo (SURVEY §7 north star).

The reference's configs are executable Python; SURVEY §7 requires the
per-layer contracts (pp string language, model/optimizer/eval config
schema) to stay API-identical so reference configs run unmodified. These
tests load the actual files from /root/reference and prove, per config:

  1. the pp strings parse against THIS repo's op registry,
  2. model_name + config.model build THIS repo's flax model,
  3. the optimizer section builds THIS repo's gradient transform,
  4. every evaluator type resolves to one of THIS repo's evaluators,

and, end-to-end, that vit_s16_i1k trains with this repo's trainer with
only the data source and run-length knobs overridden (ImageNet itself is
not in the image; everything semantic — pp, model, loss, optimizer,
schedule shape, mixup — is the reference's).
"""

import importlib
import os
import subprocess
import sys

import numpy as np
import pytest

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "big_vision")),
    reason="reference checkout not available")

# (config module name, get_config arg)
CONFIGS = [
    ("vit_s16_i1k", None),
    ("vit_i1k", "variant=B/16"),
    ("vit_i21k", "variant=B/32"),
    ("bit_i1k", None),
    ("mlp_mixer_i1k", None),
    ("transfer", "model=vit-s16,dataset=cifar10,crop=resmall_crop"),
    ("load_and_eval", "name=vit_i21k,batch_size=8"),
]

# Project configs: structural checks only (their trainers/models have
# family-specific config schemas exercised by the per-family e2e tests in
# test_train_e2e.py and friends).
STRUCTURAL = [
    ("proj.flexivit.i21k_sup", None),
    ("proj.flexivit.i1k_deit3_distill", None),
    ("proj.gsam.vit_i1k_gsam_no_aug", None),
    ("proj.distill.bit_i1k", None),
    ("proj.jet.imagenet64", None),
    ("proj.givt.givt_imagenet2012", None),
    ("proj.jetformer.jetformer_imagenet2012", None),
    ("proj.uvim.train_coco_panoptic_pretrained", None),
    ("proj.cappa.pretrain", None),
    ("proj.image_text.siglip_lit_coco", None),
    ("proj.clippo.train_clippo", None),
]

IMAGENET_N = 1_281_167


def load_ref_config(name, arg=None):
  if REF not in sys.path:
    sys.path.insert(0, REF)
  mod = importlib.import_module(f"big_vision.configs.{name}")
  return mod.get_config() if arg is None else mod.get_config(arg)


def iter_pp_strings(config):
  if config.get("input") and config.input.get("pp"):
    yield "input.pp", config.input.pp
  data = config.get("input", {}).get("data")
  if isinstance(data, (list, tuple)):
    for i, (_, sub) in enumerate(data):
      if sub.get("pp"):
        yield f"input.data[{i}].pp", sub["pp"]
  for name, ev in (config.get("evals") or {}).items():
    for key in ("pp_fn", "pp", "pp_img", "pp_txt"):
      if ev.get(key):
        yield f"evals.{name}.{key}", ev[key]


def import_pp_modules(config, name=""):
  # Per-family defaults mirror the reference trainers (e.g. the uvim
  # trainer defaults pp_modules to include proj.uvim.pp_ops,
  # ref trainers/proj/uvim/train.py:115-116).
  family_defaults = {"proj.uvim": ["proj.uvim.pp_ops"]}
  extra = [m for fam, ms in family_defaults.items()
           if name.startswith(fam) for m in ms]
  mods = list(config.get("pp_modules",
                         ["ops_general", "ops_image", "ops_text"]))
  for m in {"ops_general", "ops_image", "ops_text", "autoaugment",
            *mods, *extra}:
    importlib.import_module(f"big_vision_tpu.pp.{m}")


@pytest.mark.parametrize("name, arg", CONFIGS + STRUCTURAL)
def test_config_loads(name, arg):
  config = load_ref_config(name, arg)
  # Distill configs name a student/teacher pair instead of model_name.
  assert config.get("model_name") or config.get("student_name")
  assert "lr" in config


@pytest.mark.parametrize("name, arg", CONFIGS + STRUCTURAL)
def test_pp_strings_parse(name, arg):
  from big_vision_tpu.pp import builder as pp_builder
  config = load_ref_config(name, arg)
  import_pp_modules(config, name)
  n = 0
  for where, s in iter_pp_strings(config):
    pfn = pp_builder.get_preprocess_fn(str(s))
    assert pfn.ops, f"{name}: empty pipeline from {where}: {s}"
    n += 1
  assert n, f"{name}: no pp strings found"


@pytest.mark.parametrize("name, arg", CONFIGS)
def test_model_and_optimizer_build(name, arg):
  import jax
  import jax.numpy as jnp
  import big_vision_tpu.optim as bv_optim
  import big_vision_tpu.utils as u

  config = load_ref_config(name, arg)
  model_mod = importlib.import_module(
      f"big_vision_tpu.models.{config.model_name}")
  model = model_mod.Model(num_classes=config.num_classes,
                          **config.get("model", {}))

  res = 224
  params = jax.eval_shape(
      lambda r: model.init(r, jnp.zeros((1, res, res, 3), jnp.float32),
                           train=True)["params"],
      jax.random.PRNGKey(0))

  batch_size = config.input.batch_size
  total_steps = u.steps("total", config, IMAGENET_N, batch_size, default=100)
  tx, sched_fns = bv_optim.make(
      config, params,
      sched_kw=dict(total_steps=max(total_steps, 2), batch_size=batch_size,
                    data_size=IMAGENET_N))
  assert sched_fns
  state = jax.eval_shape(tx.init, params)
  assert state is not None


@pytest.mark.parametrize("name, arg", CONFIGS + STRUCTURAL)
def test_evaluator_types_resolve(name, arg):
  config = load_ref_config(name, arg)
  for ev_name, ev in (config.get("evals") or {}).items():
    typ = ev.get("type", ev_name)
    mod = importlib.import_module(f"big_vision_tpu.evaluators.{typ}")
    assert hasattr(mod, "Evaluator"), f"{name}: evals.{ev_name} type {typ}"


@pytest.mark.parametrize("name, arg", STRUCTURAL)
def test_model_module_resolves(name, arg):
  config = load_ref_config(name, arg)
  for key in ("model_name", "student_name", "teacher_name"):
    if config.get(key):
      mod = importlib.import_module(f"big_vision_tpu.models.{config[key]}")
      assert hasattr(mod, "Model"), f"{name}: {key}={config[key]}"


def test_dummy_data_source():
  """load_and_eval points training input at bv:dummy + spec; the trainer
  only uses it for init shapes (eval-only mode)."""
  from big_vision_tpu import input_pipeline
  config = load_ref_config("load_and_eval", "name=vit_i21k,batch_size=8")
  import_pp_modules(config)
  spec = input_pipeline.element_spec(config.input.to_dict())
  assert spec["image"].shape == (224, 224, 3)


@pytest.mark.slow
def test_vit_s16_i1k_trains_e2e(tmp_path):
  """The reference's flagship config, trained by THIS repo's trainer.

  Only the data source (ImageNet -> synthetic JPEGs) and run-length knobs
  (steps/batch/warmup/shuffle-buffer/ckpt cadence) are overridden; pp
  strings, model section, loss, optimizer, schedule type, and mixup are
  the reference's verbatim. Also exercises the element_spec-derived init
  (reference configs carry no init_shapes).
  """
  code = f"""
import sys
sys.path.insert(0, {REF!r})
from big_vision.configs import vit_s16_i1k
config = vit_s16_i1k.get_config()

config.input.data = dict(name="synthetic", n=128, num_classes=1000,
                         h=96, w=112)
config.input.shuffle_buffer_size = 256
config.input.batch_size = 8
del config.total_epochs
config.total_steps = 2
config.schedule.warmup_steps = 1
config.log_training_steps = 1
config.ckpt_steps = 0
pp_eval = config.evals.val.pp_fn
config.evals = dict(val=dict(
    type="classification",
    data=dict(name="synthetic", n=16, num_classes=1000, h=96, w=112),
    pp_fn=pp_eval, loss_name=config.loss, log_steps=2))

from big_vision_tpu import train
train.main(config=config, workdir={str(tmp_path / "wd")!r})
print("E2E_OK")
"""
  env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO}
  r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                     capture_output=True, text=True, timeout=1200)
  assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
  assert "E2E_OK" in r.stdout
  import json
  rows = [json.loads(l) for l in
          open(tmp_path / "wd" / "big_vision_metrics.txt")]
  steps = {row["step"] for row in rows}
  assert 2 in steps
  final = [row for row in rows if row["step"] == 2][-1]
  assert "training_loss" in final and "val/prec@1" in final
  assert np.isfinite(final["training_loss"])
