"""FlexiViT trainers (e2e), UViM task adapters, givt/cappa helpers."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import ml_collections as mlc
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _task_config(**inputs):
  config = mlc.ConfigDict()
  config.model = mlc.ConfigDict()
  config.model.patch_size = (4, 4)
  config.model.input_size = (8, 8)
  config.model.inputs = mlc.ConfigDict(inputs)
  return config


def test_panoptic_task_roundtrip():
  from big_vision_tpu.trainers.proj.uvim import panoptic_task
  config = _task_config(semantics=(5, 16), instances=(4, 16))
  labels = np.zeros((2, 8, 8, 2), np.int32)
  labels[:, :, 4:, 0] = 1
  labels[:, :, 4:, 1] = 1
  batch = {"labels": jnp.asarray(labels)}
  x = panoptic_task.input_pp(batch, config)["x"]
  assert x["semantics"].shape == (2, 4, 5, 16)  # [B, patches, C, px]
  # Perfect logits (the one-hot labels) reconstruct the label map.
  out = panoptic_task.predict_outputs(x, config)
  np.testing.assert_array_equal(np.asarray(out[..., 0]), labels[..., 0])
  loss, aux = panoptic_task.loss_fn(x, batch, config)
  assert "loss_semantics" in aux and loss.shape == (2, 4, 16)


def test_depth_task_roundtrip():
  from big_vision_tpu.trainers.proj.uvim import depth_task
  config = _task_config(depth=(8, 16))
  config.min_depth, config.max_depth = 0.0, 8.0
  depth = np.full((2, 8, 8, 1), 3.2, np.float32)
  batch = {"labels": jnp.asarray(depth)}
  x = depth_task.input_pp(batch, config)["x"]
  assert x["depth"].shape == (2, 4, 8, 16)
  out = depth_task.predict_outputs(x, config)
  # Bin 3 (3.2 / (8/8bins)) -> center 3.5.
  np.testing.assert_allclose(np.asarray(out["depth"]), 3.5, atol=1e-6)
  # Bin 0 is masked from the loss.
  loss, _ = depth_task.loss_fn(
      {"depth": x["depth"]}, {"labels": jnp.zeros((2, 8, 8, 1))}, config)
  assert float(jnp.sum(jnp.abs(loss))) == 0.0


def test_colorization_task_roundtrip():
  from big_vision_tpu.trainers.proj.uvim import colorization_task
  config = _task_config()
  rgb = np.random.RandomState(0).uniform(-1, 1, (2, 8, 8, 3)).astype(
      np.float32)
  x = colorization_task.input_pp({"labels": jnp.asarray(rgb)}, config)["x"]
  out = colorization_task.predict_outputs(x, config)
  np.testing.assert_allclose(np.asarray(out["color"]), rgb, atol=1e-6)
  loss, _ = colorization_task.loss_fn(x, {"labels": jnp.asarray(rgb)},
                                      config)
  assert float(jnp.max(jnp.abs(loss))) == 0.0


def test_unbin_depth_and_local_rng():
  from big_vision_tpu.trainers.proj.givt import utils as givt_utils
  one_hot = jax.nn.one_hot(jnp.asarray([[10, 200]]), 256)
  d = givt_utils.unbin_depth(one_hot, min_depth=0.0, max_depth=10.0,
                             num_bins=256)
  np.testing.assert_allclose(np.asarray(d[0]),
                             [(10.5 / 256) * 10, (200.5 / 256) * 10],
                             rtol=1e-5)
  k1 = givt_utils.get_local_rng(0, {"image": jnp.ones((2, 4, 4, 3))})
  k2 = givt_utils.get_local_rng(0, {"image": jnp.zeros((2, 4, 4, 3))})
  assert not np.array_equal(np.asarray(k1), np.asarray(k2))


def test_flexi_resample_patchemb_pi_property():
  """PI-resize: resampled kernel on resized patch ~ original on original."""
  from big_vision_tpu.models.proj.flexi import vit as fv
  rs = np.random.RandomState(0)
  kernel = jnp.asarray(rs.randn(8, 8, 3, 5), jnp.float32)
  patch = jnp.asarray(rs.randn(8, 8, 3), jnp.float32)
  up = fv.resample_patchemb(kernel, (16, 16))
  patch_up = jax.image.resize(patch, (16, 16, 3), "linear")
  want = jnp.einsum("hwc,hwcd->d", patch, kernel)
  got = jnp.einsum("hwc,hwcd->d", patch_up, up)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=0.02)


@pytest.mark.slow
@pytest.mark.parametrize("mode,module", [
    ("train", "big_vision_tpu.trainers.proj.flexi.train"),
    ("distill", "big_vision_tpu.trainers.proj.flexi.distill"),
])
def test_flexi_trainers_e2e(tmp_path, mode, module):
  env = {**os.environ, "JAX_PLATFORMS": "cpu", "XLA_FLAGS": "",
         "PYTHONPATH": REPO}
  r = subprocess.run(
      [sys.executable, "-m", module,
       "--config", f"big_vision_tpu/configs/proj/flexi/smoke.py:"
       f"mode='{mode}'",
       "--workdir", str(tmp_path / "wd")],
      cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
  assert r.returncode == 0, r.stderr[-4000:]
  assert "training_loss" in (r.stderr + r.stdout)
