"""JetFormer: right-align, cache-decode oracle, CFG, patch-PCA, e2e train."""

import os
import subprocess
import sys

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from big_vision_tpu.models.proj.givt import distributions
from big_vision_tpu.models.proj.jetformer import jetformer, patch_pca
from big_vision_tpu.trainers.proj.jetformer import predict_fns

# Multi-minute on the 1-CPU CI host (jit compiles dominate): heavy tier.
pytestmark = pytest.mark.heavy


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_model(**kw):
  return jetformer.Model(
      width=32, depth=2, mlp_dim=64, num_heads=2, num_kv_heads=1,
      head_dim=16, vocab_size=11, bos_id=8, boi_id=9, nolabel_id=10,
      out_dim=6, num_mixtures=3, scan=True, **kw)


def test_right_align_permutation():
  rs = np.random.RandomState(0)
  x = jnp.asarray(rs.randn(2, 7, 3), jnp.float32)
  # Invalid tokens anywhere, incl. the middle.
  mask = jnp.asarray([[1, 0, 1, 1, 0, 1, 0], [1, 1, 1, 1, 1, 1, 1]], bool)
  attn = jnp.tile(jnp.tril(jnp.ones((7, 7), bool))[None], (2, 1, 1))
  attn = attn & mask[:, None, :]
  xa, aa, ma = jetformer.right_align(x, attn, mask)
  # Example 0 has 4 valid tokens -> they sit at the last 4 positions,
  # original order preserved.
  np.testing.assert_array_equal(np.asarray(ma[0]),
                                [0, 0, 0, 1, 1, 1, 1])
  np.testing.assert_allclose(np.asarray(xa[0, 3:]),
                             np.asarray(x)[0][[0, 2, 3, 5]])
  # Fully-valid example is untouched.
  np.testing.assert_allclose(np.asarray(xa[1]), np.asarray(x[1]))
  np.testing.assert_array_equal(np.asarray(aa[1]), np.asarray(attn[1]))
  # Permuted attention stays consistent: valid->valid edges preserved.
  assert bool(aa[0, 6, 3])  # last valid attends to first valid


def test_forward_shapes_and_order_switch():
  model = tiny_model()
  text = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
  img = jnp.asarray(np.random.RandomState(0).randn(2, 5, 6), jnp.float32)
  tf = jnp.asarray([True, False])
  params = model.init(jax.random.PRNGKey(0), text, img,
                      text_first_mask=tf)["params"]
  text_logits, img_logits, pmf, pdf, _ = model.apply(
      {"params": params}, text, img, tf)
  assert text_logits.shape == (2, 2, 11)
  assert img_logits.shape == (2, 5, model.num_logits)
  assert pmf.log_prob(text).shape == (2, 2)
  assert pdf.log_prob(img).shape == (2, 5)


def test_prefill_extend_matches_teacher_forcing():
  """KV-cache decode reproduces the full forward, incl. padded prompts."""
  model = tiny_model()
  rs = np.random.RandomState(1)
  text = jnp.asarray([[1, 2, 3], [4, 5, 0]], jnp.int32)
  text_mask = jnp.asarray([[1, 1, 1], [1, 1, 0]], bool)
  img = jnp.asarray(rs.randn(2, 4, 6), jnp.float32)
  tf = jnp.full((2,), True)
  params = model.init(jax.random.PRNGKey(0), text, img,
                      text_first_mask=tf,
                      text_input_mask=text_mask)["params"]
  variables = {"params": params}

  # Oracle: teacher-forced image logits.
  _, img_logits, *_ = model.apply(variables, text, img, tf,
                                  text_input_mask=text_mask)

  # Incremental: prefill [bos, text, boi], then feed image tokens.
  img0 = img[:, :0]
  x, attn, im = nn.apply(
      lambda m: m.embed_image_and_text(
          text, img0, text_first_mask=tf, text_input_mask=text_mask,
          shift=False), model)(variables)
  n = img.shape[1]
  prelogits, aux = model.apply(
      variables, x, attn, im, cache_size=x.shape[1] + n - 1,
      method=model.prefill_cache, mutable=["cache"])
  cache = aux["cache"]
  got = [nn.apply(lambda m, p: m.img_logits(p), model)(
      variables, prelogits[:, -1:])]
  for i in range(n - 1):
    emb = nn.apply(lambda m, t: m.img_emb(t), model)(variables,
                                                     img[:, i:i + 1])
    prelogits, aux = model.apply(
        {**variables, "cache": cache}, emb, method=model.extend_cache,
        mutable=["cache"])
    cache = aux["cache"]
    got.append(nn.apply(lambda m, p: m.img_logits(p), model)(variables,
                                                             prelogits))
  got = jnp.concatenate(got, axis=1)
  np.testing.assert_allclose(np.asarray(got), np.asarray(img_logits),
                             atol=2e-4)


def test_categorical_matches_softmax():
  logits = jnp.asarray(np.random.RandomState(0).randn(3, 5), jnp.float32)
  pmf = distributions.Categorical(logits)
  want = jax.nn.log_softmax(logits)[jnp.arange(3), jnp.array([0, 4, 2])]
  got = pmf.log_prob(jnp.array([0, 4, 2]))
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)
  assert float(pmf.log_prob(jnp.array([0, 5, 2]))[1]) == -np.inf


def test_gaussian_cfg_w0_matches_conditional():
  loc_c = jnp.asarray([[0.5, -1.0]])
  scale_c = jnp.asarray([[0.3, 0.7]])
  cfg = distributions.GaussianCFG(loc_c, scale_c, loc_c + 1.0,
                                  scale_c, w=0.0)
  samples = jax.vmap(lambda k: cfg.sample(k))(
      jax.random.split(jax.random.PRNGKey(0), 4000))
  mean = np.asarray(jnp.mean(samples, axis=0))[0]
  std = np.asarray(jnp.std(samples, axis=0))[0]
  np.testing.assert_allclose(mean, [0.5, -1.0], atol=0.05)
  np.testing.assert_allclose(std, [0.3, 0.7], atol=0.05)


def test_gaussian_cfg_guides_away_from_uncond():
  # Guided density ~ N(loc_c + w*(loc_c - loc_u), ...) for equal scales.
  cfg = distributions.GaussianCFG(
      jnp.asarray([[1.0]]), jnp.asarray([[0.5]]),
      jnp.asarray([[0.0]]), jnp.asarray([[0.5]]), w=1.0)
  samples = jax.vmap(lambda k: cfg.sample(k))(
      jax.random.split(jax.random.PRNGKey(1), 4000))
  assert abs(float(jnp.mean(samples)) - 2.0) < 0.1


def test_patch_pca_roundtrip():
  model = patch_pca.Model(input_size=(8, 8), patch_size=(4, 4),
                          codeword_dim=48, noise_std=0.0,
                          skip_pca=True)
  x = jnp.asarray(np.random.RandomState(0).uniform(-0.9, 0.9, (2, 8, 8, 3)),
                  jnp.float32)
  (mu, logvar), _ = model.init_with_output(jax.random.PRNGKey(0), x,
                                           method=model.encode)
  assert mu.shape == (2, 4, 48) and float(jnp.sum(logvar ** 2)) == 0.0
  back = model.apply({"params": {}}, mu, method=model.decode)
  np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


def test_sample_image_latents_and_text():
  model = tiny_model()
  text = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
  img = jnp.asarray(np.random.RandomState(0).randn(2, 4, 6), jnp.float32)
  params = model.init(jax.random.PRNGKey(0), text, img,
                      text_first_mask=jnp.full((2,), True))["params"]
  out = jax.jit(lambda p: predict_fns.sample_image_latents(
      p, {"text": text}, model=model, decode_len=4,
      rng=jax.random.PRNGKey(2)))(params)
  assert out["out_tokens"].shape == (2, 4, 6)
  assert out["out_logp"].shape == (2, 4)
  assert np.all(np.isfinite(np.asarray(out["out_tokens"])))

  # CFG path.
  out_cfg = jax.jit(lambda p: predict_fns.sample_image_latents(
      p, {"text": text}, model=model, decode_len=3, cfg_weight=1.5,
      rng=jax.random.PRNGKey(3)))(params)
  assert out_cfg["out_tokens"].shape == (2, 3, 6)
  assert np.all(np.isfinite(np.asarray(out_cfg["out_tokens"])))

  out_txt = jax.jit(lambda p: predict_fns.sample_text(
      p, {"image_latents": img, "text": None}, model=model, decode_len=3,
      rng=jax.random.PRNGKey(4)))(params)
  assert out_txt["out_tokens"].shape == (2, 3)
  assert np.all((np.asarray(out_txt["out_tokens"]) >= 0)
                & (np.asarray(out_txt["out_tokens"]) < 22))


@pytest.mark.slow
def test_jetformer_train_e2e(tmp_path):
  env = {**os.environ, "JAX_PLATFORMS": "cpu", "XLA_FLAGS": "",
         "PYTHONPATH": REPO}
  r = subprocess.run(
      [sys.executable, "-m", "big_vision_tpu.trainers.proj.jetformer.train",
       "--config", "big_vision_tpu/configs/proj/jetformer/smoke.py",
       "--workdir", str(tmp_path / "wd")],
      cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
  assert r.returncode == 0, r.stderr[-4000:]
  out = r.stderr + r.stdout
  assert "training_loss" in out
