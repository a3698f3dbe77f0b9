"""GIVT: distributions, model modes, VAE, AR and parallel decoding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from big_vision_tpu.models.proj.givt import (decode, distributions, givt,
                                             parallel_decode, vae)


def test_per_channel_mixture_logprob_matches_manual():
  rs = np.random.RandomState(0)
  probs = jax.nn.softmax(jnp.asarray(rs.randn(2, 3, 4)), -1)  # D=3, M=4
  locs = jnp.asarray(rs.randn(2, 3, 4))
  scales = jnp.asarray(np.abs(rs.randn(2, 3, 4)) + 0.5)
  pdf = distributions.PerChannelMixture(probs, locs, scales)
  x = jnp.asarray(rs.randn(2, 3))
  got = np.asarray(pdf.log_prob(x))

  def normal_pdf(x, m, s):
    return np.exp(-0.5 * ((x - m) / s) ** 2) / (s * np.sqrt(2 * np.pi))
  want = np.log(np.sum(np.asarray(probs) * normal_pdf(
      np.asarray(x)[..., None], np.asarray(locs), np.asarray(scales)), -1))
  np.testing.assert_allclose(got, want, rtol=1e-5)
  s = pdf.sample(jax.random.PRNGKey(0))
  assert s.shape == (2, 3)


def test_diag_mixture():
  rs = np.random.RandomState(1)
  logits = jnp.asarray(rs.randn(2, 3))      # M=3
  locs = jnp.asarray(rs.randn(2, 3, 4))     # D=4
  scales = jnp.asarray(np.abs(rs.randn(2, 3, 4)) + 0.5)
  pdf = distributions.DiagMixture(logits, locs, scales)
  x = jnp.asarray(rs.randn(2, 4))
  lp = pdf.log_prob(x)
  assert lp.shape == (2,)
  assert pdf.sample(jax.random.PRNGKey(0)).shape == (2, 4)


def test_mvn_tri_matches_scipy():
  from scipy.stats import multivariate_normal
  rs = np.random.RandomState(2)
  loc = rs.randn(3)
  a = rs.randn(3, 3)
  tril = np.tril(a) + np.eye(3) * 2
  pdf = distributions.MultivariateNormalTri(jnp.asarray(loc),
                                            jnp.asarray(tril))
  x = rs.randn(3)
  want = multivariate_normal(loc, tril @ tril.T).logpdf(x)
  np.testing.assert_allclose(float(pdf.log_prob(jnp.asarray(x))), want,
                             rtol=1e-5)


def make_givt(style="ar", **kw):
  model = givt.Model(num_decoder_layers=2, num_heads=2, mlp_dim=32,
                     emb_dim=16, num_labels=10, seq_len=6, out_dim=4,
                     num_mixtures=2, style=style, **kw)
  seq = jnp.zeros((2, 6, 4))
  labels = jnp.zeros((2,), jnp.int32)
  mask = jnp.zeros((2, 6), bool) if style == "masked" else None
  params = model.init(jax.random.PRNGKey(0), seq, labels,
                      input_mask=mask)["params"]
  return model, params


def test_givt_ar_forward():
  model, params = make_givt("ar")
  seq = jnp.asarray(np.random.RandomState(0).randn(2, 6, 4), jnp.float32)
  logits, pdf = model.apply({"params": params}, seq,
                            jnp.zeros((2,), jnp.int32))
  assert logits.shape == (2, 6, model.num_logits)
  lp = pdf.log_prob(seq)
  assert lp.shape == (2, 6, 4)  # per-channel mixtures


def test_givt_ar_causality():
  model, params = make_givt("ar")
  rs = np.random.RandomState(0)
  s1 = jnp.asarray(rs.randn(1, 6, 4), jnp.float32)
  s2 = s1.at[0, 4].set(99.0)
  l1 = model.apply({"params": params}, s1, jnp.zeros((1,), jnp.int32))[0]
  l2 = model.apply({"params": params}, s2, jnp.zeros((1,), jnp.int32))[0]
  # Label is prepended; logits at t use tokens < t.
  np.testing.assert_allclose(np.asarray(l1[0, :5]), np.asarray(l2[0, :5]),
                             atol=1e-5)


def test_givt_masked_forward():
  model, params = make_givt("masked")
  seq = jnp.asarray(np.random.RandomState(0).randn(2, 6, 4), jnp.float32)
  mask = jnp.asarray([[1, 0, 1, 0, 1, 0], [0, 0, 0, 1, 1, 1]], bool)
  logits = model.apply({"params": params}, seq,
                       jnp.zeros((2,), jnp.int32), input_mask=mask)[0]
  assert logits.shape == (2, 6, model.num_logits)


def test_givt_mask_training_ratio():
  model, _ = make_givt("masked")
  mask = model.get_input_mask_training(jax.random.PRNGKey(0), (8, 100))
  frac = float(jnp.mean(mask))
  assert 0.3 <= frac <= 1.0  # at least min_masking_rate


def test_givt_ar_decode_shapes():
  model, params = make_givt("ar")
  tokens = decode.generate(
      {"params": params}, model, jax.random.PRNGKey(0), batch_size=2,
      labels=jnp.zeros((2,), jnp.int32))
  assert tokens.shape == (2, 6, 4)
  assert np.isfinite(np.asarray(tokens)).all()


def test_givt_parallel_decode_shapes():
  model, params = make_givt("masked")
  tokens = parallel_decode.decode_masked(
      params, model, jax.random.PRNGKey(0), batch_size=2,
      labels=jnp.zeros((2,), jnp.int32),
      config=parallel_decode.MaskedGenerationConfig(steps=4))
  assert tokens.shape == (2, 6, 4)
  assert np.isfinite(np.asarray(tokens)).all()


def test_vae_roundtrip_shapes():
  model = vae.Model(codeword_dim=4, filters=8, num_res_blocks=1,
                    channel_multipliers=(1, 2))
  img = jnp.zeros((2, 16, 16, 3))
  params = model.init(jax.random.PRNGKey(0), img)["params"]
  recon, out = model.apply({"params": params}, img)
  assert recon.shape == img.shape
  assert out["z"].shape == (2, 64, 4)  # 8x8 grid
  kl = vae.kl_divergence(out["mu"], out["logvar"])
  assert kl.shape == (2,)
  assert np.all(np.asarray(kl) >= -1e-4)
