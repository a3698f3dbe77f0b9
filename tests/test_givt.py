"""GIVT: distributions, model modes, VAE, AR and parallel decoding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from big_vision_tpu.models.proj.givt import (decode, distributions, givt,
                                             parallel_decode, vae)

# Multi-minute on the 1-CPU CI host (jit compiles dominate): heavy tier.
pytestmark = pytest.mark.heavy



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


def test_cnn_vae_roundtrip_and_pixel_shuffle():
  """MaskGIT tokenizer VAE (proj.givt.cnn): encode/decode shapes with and
  without pixel-shuffle token folding, malib [-1,1] output clipping."""
  from big_vision_tpu.models.proj.givt import cnn
  model = cnn.Model(codeword_dim=4, code_len=16, filters=32,
                    num_res_blocks=1, channel_multipliers=(1, 2),
                    malib_ckpt=True, pixel_shuffle_patch_size=(2, 2))
  img = jnp.linspace(-1, 1, 2 * 16 * 16 * 3).reshape(2, 16, 16, 3)
  params = model.init(jax.random.PRNGKey(0), img)["params"]
  mu, logvar = model.apply({"params": params}, img, method=model.encode)
  # 16x16 img, one downsample -> 8x8 latents; (2,2) shuffle -> 16 tokens
  # of dim codeword_dim*4.
  assert mu.shape == logvar.shape == (2, 16, 16)
  assert np.all(np.asarray(logvar) <= 20.0)
  rec = model.apply({"params": params}, mu, method=model.decode)
  assert rec.shape == img.shape
  assert np.all(np.abs(np.asarray(rec)) <= 1.0)
  # Full __call__ (train=False): z == mu.
  rec2, out = model.apply({"params": params}, img)
  np.testing.assert_allclose(np.asarray(rec2), np.asarray(rec), atol=1e-6)
  np.testing.assert_allclose(np.asarray(out["z"]), np.asarray(mu))


def test_cnn_vae_malib_checkpoint_load(tmp_path):
  """cnn.load remaps a malib VAE-GAN checkpoint's g_params/ (or
  ema_params/) onto cnn_encoder/cnn_decoder (ref cnn.py:333-376)."""
  import flax.training.checkpoints
  from big_vision_tpu.models.proj.givt import cnn
  model = cnn.Model(codeword_dim=4, code_len=64, filters=32,
                    num_res_blocks=1, channel_multipliers=(1, 2),
                    malib_ckpt=True)
  img = jnp.zeros((1, 16, 16, 3))
  params = jax.device_get(model.init(jax.random.PRNGKey(0), img)["params"])
  g = jax.tree.map(lambda x: x + 1.0, params)
  ema = jax.tree.map(lambda x: x + 2.0, params)
  fake = {"g_params": {"encoder": g["cnn_encoder"],
                       "decoder": g["cnn_decoder"]},
          "ema_params": {"encoder": ema["cnn_encoder"],
                         "decoder": ema["cnn_decoder"]},
          "d_params": {"junk": np.zeros((3,))}}
  path = flax.training.checkpoints.save_checkpoint(
      str(tmp_path), fake, step=0, prefix="ckpt_")
  for use_ema, src in ((False, g), (True, ema)):
    loaded = cnn.load(params, path, malib_ckpt=True, use_ema_params=use_ema)
    jax.tree.map(np.testing.assert_allclose,
                 loaded,
                 {"cnn_encoder": src["cnn_encoder"],
                  "cnn_decoder": src["cnn_decoder"]})


def test_givt_uvim_task_trainer_e2e(tmp_path):
  """Conditioned GIVT (UViM-style): VAE on labels, encoder on image,
  sampled depth output through the depth evaluator."""
  import ml_collections as mlc
  import numpy as np
  from big_vision_tpu.trainers.proj.givt import generative

  rs = np.random.RandomState(0)
  n, res, patch = 16, 16, 8
  images = [rs.uniform(-1, 1, (res, res, 3)).astype(np.float32)
            for _ in range(n)]
  labels = [rs.uniform(1.0, 9.0, (res, res, 1)).astype(np.float32)
            for _ in range(n)]

  config = mlc.ConfigDict()
  config.seed = 0
  config.total_steps = 2
  config.min_depth = 0.001
  config.max_depth = 10.0
  config.cond_image = "image"
  config.input = dict(
      data=dict(name="arrays", data={"image": images, "labels": labels}),
      batch_size=8, shuffle_buffer_size=8, num_threads=1, prefetch=1,
      pp="")
  config.log_training_steps = 2
  config.ckpt_steps = None

  config.vae = mlc.ConfigDict()
  config.vae.model_name = "proj.givt.vit"
  config.vae.inkey = "labels"
  config.vae.model = mlc.ConfigDict(dict(
      input_size=(res, res), patch_size=(patch, patch),
      code_len=4, codeword_dim=8, width=32, enc_depth=1, dec_depth=1,
      num_heads=2, bottleneck_resize=True,
      inout_specs={"depth": (0, 16)}))
  config.vae.init_shapes = [(1, res, res, 1)]

  config.model_name = "proj.givt.givt"
  config.model = dict(
      num_layers=1, num_decoder_layers=1, num_heads=2, mlp_dim=32,
      emb_dim=16, patches=(patch, patch), input_size=(res, res),
      num_labels=None, seq_len=4, out_dim=8, num_mixtures=2, style="ar")
  config.ar_generation_config = dict(temp=0.9, temp_probs=1.0)

  config.optax_name = "scale_by_adam"
  config.lr = 1e-3
  config.wd = 0.0
  config.schedule = dict(warmup_steps=1, decay_type="cosine")
  config.evals = {}
  config.evals.val = dict(
      type="mean", pred="validation",
      data=dict(name="arrays", data={"image": images, "labels": labels}),
      pp_fn="", batch_size=8, log_steps=2)
  config.evals.depth = dict(
      type="proj.givt.nyu_depth", pred="depth",
      data=dict(name="arrays",
                data={"image": images, "labels": labels,
                      "ground_truth": labels}),
      pp_fn="", batch_size=8, log_steps=2)

  train_state = generative.main(config=config,
                                workdir=str(tmp_path / "wd"))
  assert train_state is not None
  metrics = (tmp_path / "wd" / "big_vision_metrics.txt").read_text()
  assert "val/nll" in metrics and "depth/RMSE" in metrics


def test_cfg_rejection_sampler_matches_density():
  """DB-CFG sampler (ref parallel_decode.py:264) vs numerically
  integrated p_c^(1+w)/p_u^w: KS distance on 20k draws."""
  rs = np.random.RandomState(0)
  M, dim, w = 3, 2, 0.7
  logits_c = jnp.asarray(rs.randn(1, 1, M))
  locs_c = jnp.asarray(rs.randn(1, 1, M, dim))
  scales_c = jnp.asarray(0.3 + rs.rand(1, 1, M, dim))
  locs_u = jnp.asarray(rs.randn(1, 1, M, dim) * 0.5)
  scales_u = scales_c + 0.2  # wider uncond => proper guided density
  pdf_c = distributions.DiagMixture(logits_c, locs_c, scales_c)
  pdf_u = distributions.DiagMixture(jnp.asarray(rs.randn(1, 1, M)),
                                    locs_u, scales_u)

  n = 20000
  keys = jax.random.split(jax.random.PRNGKey(1), n)

  def draw(k):
    g = distributions.make_cfg(pdf_c, pdf_u, w, k)
    return g.sample(seed=jax.random.fold_in(k, 1))

  samples = np.asarray(jax.vmap(draw)(keys))[:, 0, 0, :]

  xs = np.linspace(-8, 8, 4001)
  pi = np.asarray(jax.nn.softmax(logits_c))[0, 0]
  for d in range(dim):
    dens = np.zeros_like(xs)
    for m in range(M):
      lc, sc = float(locs_c[0, 0, m, d]), float(scales_c[0, 0, m, d])
      lu, su = float(locs_u[0, 0, m, d]), float(scales_u[0, 0, m, d])
      logp = ((1 + w) * (-0.5 * ((xs - lc) / sc) ** 2 - np.log(sc))
              - w * (-0.5 * ((xs - lu) / su) ** 2 - np.log(su)))
      p = np.exp(logp - logp.max())
      dens += pi[m] * p / np.trapezoid(p, xs)
    cdf = np.cumsum(dens) * (xs[1] - xs[0])
    cdf /= cdf[-1]
    emp = np.searchsorted(np.sort(samples[:, d]), xs) / n
    ks = np.abs(emp - cdf).max()
    assert ks < 0.02, f"dim {d}: KS {ks}"


def test_cfg_per_channel_component_replay():
  """Same component must be selected for cond and uncond densities."""
  rs = np.random.RandomState(3)
  probs = jax.nn.softmax(jnp.asarray(rs.randn(2, 3, 4)), -1)
  locs = jnp.asarray(rs.randn(2, 3, 4))
  scales = jnp.asarray(0.5 + rs.rand(2, 3, 4))
  pdf = distributions.PerChannelMixture(probs, locs, scales)
  loc1, scale1, comp = distributions.select_component(
      pdf, jax.random.PRNGKey(0))
  loc2, scale2, _ = distributions.select_component(pdf, component=comp)
  np.testing.assert_allclose(np.asarray(loc1), np.asarray(loc2))
  np.testing.assert_allclose(np.asarray(scale1), np.asarray(scale2))


def test_givt_ar_decode_cfg_exact():
  model, params = make_givt("ar", drop_labels_probability=0.1)
  kw = dict(batch_size=2, labels=jnp.zeros((2,), jnp.int32))
  tok = decode.generate({"params": params}, model, jax.random.PRNGKey(0),
                        cfg_weight=0.8, **kw)
  assert tok.shape == (2, 6, 4)
  assert np.isfinite(np.asarray(tok)).all()
  # CFG must change the samples relative to unguided decoding.
  tok0 = decode.generate({"params": params}, model, jax.random.PRNGKey(0),
                         **kw)
  assert np.abs(np.asarray(tok) - np.asarray(tok0)).max() > 1e-6
  # Fast loc-shift approximation still available.
  tok_fast = decode.generate({"params": params}, model,
                             jax.random.PRNGKey(0), cfg_weight=0.8,
                             cfg_fast_approx=True, **kw)
  assert np.isfinite(np.asarray(tok_fast)).all()


def test_givt_parallel_decode_cfg_exact():
  model, params = make_givt("masked", drop_labels_probability=0.1)
  tokens = parallel_decode.decode_masked(
      params, model, jax.random.PRNGKey(0), batch_size=2,
      labels=jnp.zeros((2,), jnp.int32),
      config=parallel_decode.MaskedGenerationConfig(
          steps=4, cfg_inference_weight=0.5))
  assert tokens.shape == (2, 6, 4)
  assert np.isfinite(np.asarray(tokens)).all()


def test_vae_trainer_xent_panoptic_e2e(tmp_path):
  """Stage-I VAE trainer with the reference's categorical-xent ELBO
  (ref trainers/proj/givt/vae.py:264-296): rec_loss_fn="xent" over
  inout_specs + code_dropout, validation ELBO eval and the panoptic
  evaluator fed by predict_panoptic."""
  import ml_collections as mlc
  from big_vision_tpu.trainers.proj.givt import vae as vae_trainer

  rs = np.random.RandomState(0)
  n, res, patch = 16, 16, 8
  # Channel 0: semantic class in [0, 5); channel 1: instance id in [0, 4).
  maps = [np.stack([rs.randint(0, 5, (res, res)),
                    rs.randint(0, 4, (res, res))],
                   -1).astype(np.float32) for _ in range(n)]
  gts = [m.astype(np.int32) for m in maps]

  config = mlc.ConfigDict()
  config.seed = 0
  config.total_steps = 2
  config.rec_loss_fn = "xent"
  config.input = dict(
      data=dict(name="arrays", data={"image": maps}),
      batch_size=8, shuffle_buffer_size=8, num_threads=1, prefetch=1,
      pp="")
  config.log_training_steps = 2
  config.ckpt_steps = None

  config.model_name = "proj.givt.vit"
  config.model = mlc.ConfigDict(dict(
      input_size=(res, res), patch_size=(patch, patch),
      code_len=4, codeword_dim=8, width=32, enc_depth=1, dec_depth=1,
      num_heads=2, bottleneck_resize=True, code_dropout="seq",
      inout_specs={"semantics": (0, 5), "instances": (1, 4)}))
  config.init_shapes = [(1, res, res, 2)]
  config.beta = 2.5e-4

  config.optax_name = "scale_by_adam"
  config.lr = 1e-3
  config.wd = 0.0
  config.schedule = dict(warmup_steps=1, decay_type="cosine")
  config.evals = {}
  config.evals.val = dict(
      type="mean", pred="validation",
      data=dict(name="arrays", data={"image": maps}),
      pp_fn="", batch_size=8, log_steps=2)
  config.evals.pq = dict(
      type="proj.givt.coco_panoptic", pred="predict_panoptic",
      data=dict(name="arrays", data={"image": maps, "ground_truth": gts}),
      pp_fn="", batch_size=8, log_steps=2)

  train_state = vae_trainer.main(config=config,
                                 workdir=str(tmp_path / "wd"))
  assert train_state is not None
  metrics = (tmp_path / "wd" / "big_vision_metrics.txt").read_text()
  assert "val/loss_rec" in metrics and "val/loss_kl" in metrics
  assert "pq/PQ" in metrics


def test_vae_trainer_xent_depth_e2e(tmp_path):
  """VAE trainer xent-depth variant (ref vae_nyu_depth.py): binned depth
  labels with mask_zero_target; predict_depth unbins logits through the
  nyu_depth evaluator."""
  import ml_collections as mlc
  from big_vision_tpu.trainers.proj.givt import vae as vae_trainer

  rs = np.random.RandomState(1)
  n, res, patch = 16, 16, 8
  depth = [rs.uniform(1.0, 9.0, (res, res, 1)).astype(np.float32)
           for _ in range(n)]

  config = mlc.ConfigDict()
  config.seed = 0
  config.total_steps = 2
  config.rec_loss_fn = "xent"
  config.mask_zero_target = True
  config.min_depth = 0.001
  config.max_depth = 10.0
  config.input = dict(
      data=dict(name="arrays", data={"image": depth}),
      batch_size=8, shuffle_buffer_size=8, num_threads=1, prefetch=1,
      pp="")
  config.log_training_steps = 2
  config.ckpt_steps = None

  config.model_name = "proj.givt.vit"
  config.model = mlc.ConfigDict(dict(
      input_size=(res, res), patch_size=(patch, patch),
      code_len=4, codeword_dim=8, width=32, enc_depth=1, dec_depth=1,
      num_heads=2, bottleneck_resize=True,
      inout_specs={"depth": (0, 16)}))
  config.init_shapes = [(1, res, res, 1)]

  config.optax_name = "scale_by_adam"
  config.lr = 1e-3
  config.wd = 0.0
  config.schedule = dict(warmup_steps=1, decay_type="cosine")
  config.evals = {}
  config.evals.depth = dict(
      type="proj.givt.nyu_depth", pred="predict_depth",
      data=dict(name="arrays",
                data={"image": depth, "ground_truth": depth}),
      pp_fn="", batch_size=8, log_steps=2)

  train_state = vae_trainer.main(config=config,
                                 workdir=str(tmp_path / "wd"))
  assert train_state is not None
  metrics = (tmp_path / "wd" / "big_vision_metrics.txt").read_text()
  assert "depth/RMSE" in metrics


def test_vae_trainer_l2_e2e(tmp_path):
  """VAE trainer default l2 path (0.5 * per-example summed square error +
  summed KL, ref vae_loss_fn) with the CNN VAE backbone and the
  per-example validation ELBO eval."""
  import ml_collections as mlc
  from big_vision_tpu.trainers.proj.givt import vae as vae_trainer

  rs = np.random.RandomState(2)
  n, res = 16, 16
  images = [rs.uniform(-1, 1, (res, res, 3)).astype(np.float32)
            for _ in range(n)]

  config = mlc.ConfigDict()
  config.seed = 0
  config.total_steps = 2
  config.input = dict(
      data=dict(name="arrays", data={"image": images}),
      batch_size=8, shuffle_buffer_size=8, num_threads=1, prefetch=1,
      pp="")
  config.log_training_steps = 2
  config.ckpt_steps = None

  config.model_name = "proj.givt.vae"
  config.model = mlc.ConfigDict(dict(
      codeword_dim=4, filters=8, num_res_blocks=1,
      channel_multipliers=(1, 2)))
  config.init_shapes = [(1, res, res, 3)]
  config.beta = 1e-4

  config.optax_name = "scale_by_adam"
  config.lr = 1e-3
  config.wd = 0.0
  config.schedule = dict(warmup_steps=1, decay_type="cosine")
  config.evals = {}
  config.evals.val = dict(
      type="mean", pred="validation",
      data=dict(name="arrays", data={"image": images}),
      pp_fn="", batch_size=8, log_steps=2)

  train_state = vae_trainer.main(config=config,
                                 workdir=str(tmp_path / "wd"))
  assert train_state is not None
  metrics = (tmp_path / "wd" / "big_vision_metrics.txt").read_text()
  assert "val/loss" in metrics and "training_loss" in metrics


def test_givt_adaptor_trainer_e2e(tmp_path):
  """Class-conditional AR GIVT trained jointly with the invertible
  latent adaptor (ref generative.py:199-233): params_adaptor in the
  train state, forward in the loss, inverse before VAE decode in the
  sample_teacher_forced / sample predict fns."""
  import ml_collections as mlc
  from big_vision_tpu.trainers.proj.givt import generative

  rs = np.random.RandomState(3)
  n, res = 16, 8
  images = [rs.uniform(-1, 1, (res, res, 3)).astype(np.float32)
            for _ in range(n)]

  config = mlc.ConfigDict()
  config.seed = 0
  config.total_steps = 2
  config.input = dict(
      data=dict(name="arrays", data={"image": images}),
      batch_size=8, shuffle_buffer_size=8, num_threads=1, prefetch=1,
      pp="")
  config.log_training_steps = 2
  config.ckpt_steps = None

  config.vae = mlc.ConfigDict(dict(
      model_name="proj.givt.vae",
      model=dict(codeword_dim=4, filters=8, num_res_blocks=1,
                 channel_multipliers=(1, 2)),
      init_shapes=[(1, res, res, 3)]))

  config.model_name = "proj.givt.givt"
  config.model = dict(
      num_decoder_layers=1, num_heads=2, mlp_dim=32, emb_dim=16,
      num_labels=None, seq_len=(res // 2) ** 2, out_dim=4,
      num_mixtures=2, style="ar")
  config.adaptor_name = "proj.givt.adaptor"
  config.adaptor = mlc.ConfigDict(
      dict(model=dict(num_blocks=2, num_channels_bottleneck=8)))
  config.ar_generation_config = dict(temp=0.9, temp_probs=1.0)

  config.optax_name = "scale_by_adam"
  config.lr = 1e-3
  config.wd = 0.0
  config.schedule = dict(warmup_steps=1, decay_type="cosine")
  config.evals = {}
  config.evals.val = dict(
      type="mean", pred="validation",
      data=dict(name="arrays", data={"image": images}),
      pp_fn="", batch_size=8, log_steps=2)
  config.evals.tf = dict(
      type="proj.uvim.psnr", pred="sample_teacher_forced",
      data=dict(name="arrays", data={"image": images, "labels": images}),
      pp_fn="", batch_size=8, log_steps=2)
  config.evals.sample = dict(
      type="proj.uvim.psnr", pred="sample",
      data=dict(name="arrays", data={"image": images, "labels": images}),
      pp_fn="", batch_size=8, log_steps=2)

  train_state = generative.main(config=config,
                                workdir=str(tmp_path / "wd"))
  assert "params_adaptor" in train_state["params"]
  metrics = (tmp_path / "wd" / "big_vision_metrics.txt").read_text()
  assert "l2_params_adaptor" in metrics
  assert "train/nll" in metrics and "l2_updates" in metrics
  assert "val/nll" in metrics
  assert "tf/PSNR" in metrics and "sample/PSNR" in metrics


def test_givt_masked_sampling_trainer_e2e(tmp_path):
  """MaskGIT-style GIVT: mean(where=mask) loss with
  fraction_masked_out metric, and the `sample` predict fn driving
  parallel decode from config.masked_generation_config."""
  import ml_collections as mlc
  from big_vision_tpu.trainers.proj.givt import generative

  rs = np.random.RandomState(4)
  n, res = 16, 8
  images = [rs.uniform(-1, 1, (res, res, 3)).astype(np.float32)
            for _ in range(n)]

  config = mlc.ConfigDict()
  config.seed = 0
  config.total_steps = 2
  config.input = dict(
      data=dict(name="arrays", data={"image": images}),
      batch_size=8, shuffle_buffer_size=8, num_threads=1, prefetch=1,
      pp="")
  config.log_training_steps = 2
  config.ckpt_steps = None

  config.vae = mlc.ConfigDict(dict(
      model_name="proj.givt.vae",
      model=dict(codeword_dim=4, filters=8, num_res_blocks=1,
                 channel_multipliers=(1, 2)),
      init_shapes=[(1, res, res, 3)]))

  config.model_name = "proj.givt.givt"
  config.model = dict(
      num_decoder_layers=1, num_heads=2, mlp_dim=32, emb_dim=16,
      num_labels=None, seq_len=(res // 2) ** 2, out_dim=4,
      num_mixtures=2, style="masked")
  config.masked_generation_config = dict(steps=3, choice_temperature=10.0)

  config.optax_name = "scale_by_adam"
  config.lr = 1e-3
  config.wd = 0.0
  config.schedule = dict(warmup_steps=1, decay_type="cosine")
  config.evals = {}
  config.evals.val = dict(
      type="mean", pred="validation",
      data=dict(name="arrays", data={"image": images}),
      pp_fn="", batch_size=8, log_steps=2)
  config.evals.sample = dict(
      type="proj.uvim.psnr", pred="sample",
      data=dict(name="arrays", data={"image": images, "labels": images}),
      pp_fn="", batch_size=8, log_steps=2)

  train_state = generative.main(config=config,
                                workdir=str(tmp_path / "wd"))
  assert train_state is not None
  metrics = (tmp_path / "wd" / "big_vision_metrics.txt").read_text()
  assert "train/fraction_masked_out" in metrics
  assert "val/nll" in metrics and "sample/PSNR" in metrics


def test_givt_ar_decode_beam_fan():
  """Beam/fan AR decoding (ref decode.py:170-380): beam search over
  accumulated sequence log-density must beat single-draw sampling, and
  the stochastic rand_top_k variant must run."""
  model, params = make_givt("ar")
  labels = jnp.zeros((2,), jnp.int32)

  toks1, lp1 = decode.generate(
      {"params": params}, model, jax.random.PRNGKey(0), labels=labels,
      return_logprobs=True)
  assert toks1.shape == (2, 6, 4) and lp1.shape == (2,)

  toks_b, lp_b = decode.generate(
      {"params": params}, model, jax.random.PRNGKey(0), labels=labels,
      beam_size=2, fan_size=8, return_logprobs=True)
  assert toks_b.shape == (2, 6, 4) and lp_b.shape == (2,)
  assert np.isfinite(np.asarray(toks_b)).all()
  assert float(lp_b.mean()) > float(lp1.mean())

  toks_r = decode.generate(
      {"params": params}, model, jax.random.PRNGKey(1), labels=labels,
      beam_size=2, fan_size=4, rand_top_k=True, rand_top_k_temp=2.0)
  assert toks_r.shape == (2, 6, 4)
  assert np.isfinite(np.asarray(toks_r)).all()


def test_givt_ar_decode_gt_pinning():
  """gt/keep_gt pins chosen positions to ground-truth tokens."""
  model, params = make_givt("ar")
  labels = jnp.zeros((2,), jnp.int32)
  gt = jnp.asarray(np.random.RandomState(0).randn(2, 6, 4), jnp.float32)
  keep = jnp.asarray([True, False, True, False, True, False])

  toks = decode.generate(
      {"params": params}, model, jax.random.PRNGKey(0), labels=labels,
      gt=gt, keep_gt=keep)
  toks = np.asarray(toks)
  np.testing.assert_allclose(toks[:, [0, 2, 4]], np.asarray(gt)[:, [0, 2, 4]],
                             rtol=1e-6)
  assert not np.allclose(toks[:, [1, 3, 5]], np.asarray(gt)[:, [1, 3, 5]])

  # Pinning also composes with beam search.
  toks_b = decode.generate(
      {"params": params}, model, jax.random.PRNGKey(0), labels=labels,
      beam_size=2, fan_size=2, gt=gt, keep_gt=keep)
  np.testing.assert_allclose(np.asarray(toks_b)[:, [0, 2, 4]],
                             np.asarray(gt)[:, [0, 2, 4]], rtol=1e-6)
