import jax
import jax.numpy as jnp
import numpy as np
import pytest

from big_vision_tpu.models import bit_paper
from big_vision_tpu.models.proj.flexi import vit as flexi_vit

# Multi-minute on the 1-CPU CI host (jit compiles dominate): heavy tier.
pytestmark = pytest.mark.heavy



def test_bit_paper_forward():
  model = bit_paper.Model(num_classes=10, depth=26, width=0.5)
  x = jnp.zeros((2, 64, 64, 3))
  params = model.init(jax.random.PRNGKey(0), x)["params"]
  logits, out = model.apply({"params": params}, x)
  assert logits.shape == (2, 10)
  import big_vision_tpu.utils as u
  names = {n for n, _ in u.tree_flatten_with_names(params)[0]}
  assert "root_block/conv_root/kernel" in names
  assert "block1/unit01/gn1/scale" in names
  assert "norm-pre-head/scale" in names


def test_flexi_patch_resample_identity():
  k = np.random.RandomState(0).randn(8, 8, 3, 16).astype(np.float32)
  out = flexi_vit.resample_patchemb(k, (8, 8))
  np.testing.assert_array_equal(np.asarray(out), k)


def test_flexi_patch_resample_pi_property():
  """PI-resize: kernel resized 2x applied to 2x-upsampled patch ~ original.

  <k, patch> should approximately equal <resize(k), resize(patch)>.
  """
  rs = np.random.RandomState(0)
  k = jnp.asarray(rs.randn(4, 4, 1, 1), jnp.float32)
  patch = jnp.asarray(rs.randn(4, 4), jnp.float32)
  k8 = flexi_vit.resample_patchemb(k, (8, 8))
  patch8 = jax.image.resize(patch, (8, 8), "linear")
  want = float(jnp.sum(k[..., 0, 0] * patch))
  got = float(jnp.sum(k8[..., 0, 0] * patch8))
  assert got == pytest.approx(want, rel=0.05)


def test_flexi_model_runtime_patch_sizes():
  model = flexi_vit.Model(4, variant="mu/16", patch_size=(8, 8),
                          posemb_size=(4, 4))
  x = jnp.zeros((1, 32, 32, 3))
  params = model.init(jax.random.PRNGKey(0), x)["params"]
  # Same params, different runtime grid sizes.
  for seqhw in (2, 4, 8):
    logits, _ = model.apply({"params": params}, x, seqhw=seqhw)
    assert logits.shape == (1, 4)


def test_configs_build():
  import importlib
  for name, arg in [
      ("vit_i1k", "runlocal"),
      ("mlp_mixer_i1k", "runlocal"),
      ("bit_i1k", "runlocal"),
      ("transfer", "model=vit-s16,dataset=cifar10"),
      ("load_and_eval", "name=vit_i1k"),
  ]:
    mod = importlib.import_module(f"big_vision_tpu.configs.{name}")
    cfg = mod.get_config(arg)
    assert "input" in cfg, name
  from big_vision_tpu.configs import common_fewshot
  fs = common_fewshot.get_fewshot_lsr(runlocal=True)
  assert fs.type == "fewshot_lsr"
