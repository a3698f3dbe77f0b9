"""UViM stage-I VQ-VAE, stage-II VTT and the sampling decoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from big_vision_tpu.models.proj.uvim import decode, vit as uvit, vtt

# Multi-minute on the 1-CPU CI host (jit compiles dominate): heavy tier.
pytestmark = pytest.mark.heavy



def make_vqvae():
  model = uvit.Model(
      inputs={"labels": (4,)}, outputs={"labels": (4,)},
      input_size=(16, 16), patch_size=(4, 4), code_len=4, width=32,
      enc_depth=1, dec_depth=1, num_heads=2, dict_size=16)
  x = {"labels": jnp.zeros((2, 16, 4), jnp.float32)}
  variables = model.init(
      {"params": jax.random.PRNGKey(0), "state": jax.random.PRNGKey(1),
       "vqvae": jax.random.PRNGKey(2)}, x)
  return model, variables, x


def test_vqvae_forward_and_quantization():
  model, variables, x = make_vqvae()
  logits, out = model.apply(variables, x)
  assert logits["labels"].shape == (2, 16, 4)
  assert out["code"].shape == (2, 4)
  assert out["bottleneck_q"].shape[-1] == 32
  # Quantized vectors are actual codewords.
  e = np.asarray(model.apply(variables, method=model.get_codewords))
  q = np.asarray(out["bottleneck_q"]).reshape(-1, 32)
  for row in q:
    assert np.min(np.linalg.norm(e - row, axis=1)) < 1e-5


def test_vqvae_train_updates_codebook():
  model, variables, x = make_vqvae()
  x = {"labels": jnp.asarray(
      np.random.RandomState(0).randn(2, 16, 4), jnp.float32)}
  _, new_state = model.apply(
      variables, x, train=True, update_dict=True,
      rngs={"vqvae": jax.random.PRNGKey(3),
            "dropout": jax.random.PRNGKey(4)},
      mutable=["state"])
  old_counts = np.asarray(variables["state"]["counts"])
  new_counts = np.asarray(new_state["state"]["counts"])
  assert not np.allclose(old_counts, new_counts)
  # No dead codewords after the revival loop.
  assert np.all(new_counts >= uvit.Model.min_count)


def test_quantize_straight_through_grad():
  e = jnp.asarray(np.random.RandomState(0).randn(8, 4), jnp.float32)

  def f(x):
    xq, _ = uvit.quantize(x, e)
    return jnp.sum(xq ** 2)

  x = jnp.asarray(np.random.RandomState(1).randn(2, 3, 4), jnp.float32)
  g = jax.grad(f)(x)
  assert g.shape == x.shape
  assert not np.allclose(np.asarray(g), 0)  # straight-through passes grads


def make_vtt():
  model = vtt.Model(patches={"size": (4, 4)}, num_heads=2, num_layers=1,
                    mlp_dim=32, emb_dim=16, vocab_size=32, seq_len=6,
                    input_size=(16, 16))
  img = jnp.zeros((2, 16, 16, 3))
  txt = jnp.ones((2, 6), jnp.int32)
  params = model.init(jax.random.PRNGKey(0), img, txt)["params"]
  return model, params, img, txt


def test_vtt_forward():
  model, params, img, txt = make_vtt()
  logits = model.apply({"params": params}, img, txt)
  assert logits.shape == (2, 6, 32)


def test_vtt_causality():
  model, params, img, txt = make_vtt()
  t1 = jnp.asarray([[3, 4, 5, 6, 7, 8]], jnp.int32)
  t2 = t1.at[0, 4].set(30)
  l1 = model.apply({"params": params}, img[:1], t1)
  l2 = model.apply({"params": params}, img[:1], t2)
  # shift_right: logits at positions <= 4 only see tokens < 4.
  np.testing.assert_allclose(l1[0, :4], l2[0, :4], atol=1e-5)


def test_decode_sampling():
  model, params, img, txt = make_vtt()
  del txt
  prompts = jnp.zeros((2, 6), jnp.int32)
  seqs, scores, logprobs = decode.temperature_sampling(
      {"params": params}, img, prompts, jax.random.PRNGKey(0),
      model=model, num_samples=3, temperature=1.0, eos_token=1)
  assert seqs.shape == (2, 3, 6)
  assert scores.shape == (2, 3)
  assert logprobs.shape == (2, 3, 6)
  # Scores sorted worst-first.
  assert np.all(np.diff(np.asarray(scores), axis=1) >= 0)


def test_decode_argmax_matches_full_forward():
  """Greedy decode via cache must equal greedy rollout via full forward."""
  model, params, img, _ = make_vtt()
  # LogitsDense is zero-init -> all logits tie; perturb so greedy is
  # well-defined.
  params = jax.tree.map(lambda x: x, params)
  params["decoder"]["LogitsDense"]["kernel"] = jnp.asarray(
      np.random.RandomState(7).randn(16, 32) * 0.5, jnp.float32)
  prompts = jnp.zeros((1, 5), jnp.int32)
  seqs, _, _ = decode.argmax_sampling(
      {"params": params}, img[:1], prompts, jax.random.PRNGKey(0),
      model=model, num_samples=1, eos_token=-1)  # no eos: full rollout
  got = np.asarray(seqs)[0, 0]

  # Oracle: token-by-token greedy using the non-cached full forward.
  toks = np.zeros(5, np.int32)
  for i in range(5):
    logits = model.apply({"params": params}, img[:1],
                         jnp.asarray(toks[None]))
    nxt = int(jnp.argmax(logits[0, i]))
    toks[i] = nxt
    if i + 1 < 5:
      pass
  np.testing.assert_array_equal(got, toks)


def test_vqvae_trainer_task_mode_panoptic(tmp_path):
  """Task-adapter path: raw panoptic maps in, PQ evaluator out."""
  import ml_collections as mlc
  import numpy as np
  from big_vision_tpu.trainers.proj.uvim import vqvae as vqvae_trainer

  rs = np.random.RandomState(0)
  n, res, patch = 16, 16, 4
  images = [rs.uniform(-1, 1, (res, res, 3)).astype(np.float32)
            for _ in range(n)]
  labels = []
  for _ in range(n):
    lab = np.zeros((res, res, 2), np.int32)
    lab[:, :8] = [1, 1]
    lab[:, 8:] = [2, 2]
    labels.append(lab)

  config = mlc.ConfigDict()
  config.seed = 0
  config.total_steps = 3
  config.task = "panoptic"
  config.min_depth = 0.0  # unused by panoptic
  config.input = dict(
      data=dict(name="arrays", data={"image": images, "labels": labels}),
      batch_size=8, shuffle_buffer_size=8, num_threads=1, prefetch=1,
      pp="")
  config.log_training_steps = 2
  config.ckpt_steps = None
  px = patch * patch
  config.model_name = "proj.uvim.vit"
  config.model = mlc.ConfigDict(dict(
      inputs={"semantics": (4, px), "instances": (4, px)},
      outputs={"semantics": (4, px), "instances": (4, px)},
      input_size=(res, res), patch_size=(patch, patch),
      code_len=4, width=32, enc_depth=1, dec_depth=1, num_heads=2,
      dict_size=16, with_encoder_ctx=True, with_decoder_ctx=True))
  config.with_ctx = True
  config.freeze_dict = False   # Stage I: train the codebook (EMA).
  config.w_commitment = 0.25   # Ref vqvae.py:204 default weight.
  config.init_head_bias = -2.0
  config.optax_name = "scale_by_adam"
  config.lr = 1e-3
  config.wd = 0.0
  config.schedule = dict(warmup_steps=1, decay_type="cosine")
  config.evals = {}
  config.evals.val = dict(
      type="proj.uvim.compute_mean", pred="validation",
      data=dict(name="arrays", data={"image": images, "labels": labels}),
      pp_fn="", batch_size=8, log_steps=3)
  config.evals.pq = dict(
      type="proj.uvim.coco_panoptic", pred="panoptic",
      data=dict(name="arrays",
                data={"image": images, "labels": labels,
                      "ground_truth": labels}),
      pp_fn="", batch_size=8, log_steps=3)

  train_state = vqvae_trainer.main(config=config,
                                   workdir=str(tmp_path / "wd"))
  assert train_state is not None
  metrics = (tmp_path / "wd" / "big_vision_metrics.txt").read_text()
  assert "val/loss" in metrics
  assert "loss_rec" in metrics and "loss_commitment" in metrics
  assert '"pq/PQ"' in metrics or "pq/PQ" in metrics


def test_stage2_trainer_task_mode_panoptic(tmp_path):
  """Stage-II in task mode: oracle-encoded codes, sampled PQ eval."""
  import ml_collections as mlc
  import numpy as np
  from big_vision_tpu.trainers.proj.uvim import train as uvim_train

  rs = np.random.RandomState(0)
  n, res, patch = 16, 16, 4
  images = [rs.uniform(-1, 1, (res, res, 3)).astype(np.float32)
            for _ in range(n)]
  labels = []
  for _ in range(n):
    lab = np.zeros((res, res, 2), np.int32)
    lab[:, :8] = [1, 1]
    lab[:, 8:] = [2, 2]
    labels.append(lab)

  px = patch * patch
  config = mlc.ConfigDict()
  config.seed = 0
  config.total_steps = 2
  config.task = "panoptic"
  config.input = dict(
      data=dict(name="arrays", data={"image": images, "labels": labels}),
      batch_size=8, shuffle_buffer_size=8, num_threads=1, prefetch=1,
      pp="")
  config.log_training_steps = 2
  config.ckpt_steps = None
  config.init_shapes = [(1, res, res, 3), (1, 4)]

  config.oracle = mlc.ConfigDict()
  config.oracle.model_name = "proj.uvim.vit"
  config.oracle.model = mlc.ConfigDict(dict(
      inputs={"semantics": (4, px), "instances": (4, px)},
      outputs={"semantics": (4, px), "instances": (4, px)},
      input_size=(res, res), patch_size=(patch, patch),
      code_len=4, width=32, enc_depth=1, dec_depth=1, num_heads=2,
      dict_size=16, with_encoder_ctx=True, with_decoder_ctx=True))
  config.oracle.with_ctx = True

  config.model_name = "proj.uvim.vtt"
  config.model = dict(
      patches=(patch, patch), input_size=(res, res), seq_len=4,
      vocab_size=16 + 1, num_layers=1, num_heads=2, mlp_dim=32,
      emb_dim=32)

  config.optax_name = "scale_by_adam"
  config.lr = 1e-3
  config.wd = 0.0
  config.schedule = dict(warmup_steps=1, decay_type="cosine")
  config.evals = {}
  config.evals.val = dict(
      type="proj.uvim.compute_mean", pred="validation",
      data=dict(name="arrays", data={"image": images, "labels": labels}),
      pp_fn="", batch_size=8, log_steps=2)
  config.evals.pq = dict(
      type="proj.uvim.coco_panoptic", pred="panoptic",
      data=dict(name="arrays",
                data={"image": images, "labels": labels,
                      "ground_truth": labels}),
      pp_fn="", batch_size=8, log_steps=2)

  train_state = uvim_train.main(config=config,
                                workdir=str(tmp_path / "wd"))
  assert train_state is not None
  metrics = (tmp_path / "wd" / "big_vision_metrics.txt").read_text()
  assert "val/loss" in metrics and "pq/PQ" in metrics


# ---------------------------------------------------------------------------
# InceptionV3 FID feature extractor (native tf_gan/tfhub replacement).
# ---------------------------------------------------------------------------


def test_inception_features_and_state_dict_roundtrip(tmp_path):
  import jax
  import jax.numpy as jnp
  import numpy as np
  from big_vision_tpu.models.proj.uvim import inception

  model = inception.InceptionV3Features()
  variables = model.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 75, 75, 3)))
  feats = model.apply(variables, jnp.zeros((2, 75, 75, 3)))
  assert feats.shape == (2, 2048)
  assert np.isfinite(np.asarray(feats)).all()

  # Inverse-convert the flax tree into a pt-style state dict npz, read it
  # back through the converter, and check the trees agree exactly.
  flat = {}
  def walk(tree, prefix):
    for k, v in tree.items():
      path = prefix + [k]
      if isinstance(v, dict):
        walk(v, path)
      else:
        flat[".".join(path)] = np.asarray(v)
  walk(jax.tree.map(np.asarray, variables["params"]), [])
  walk(jax.tree.map(np.asarray, variables["batch_stats"]), [])

  sd = {}
  for key, val in flat.items():
    parts = key.split(".")
    if parts[-1] == "kernel":
      sd[".".join(parts[:-1] + ["weight"])] = np.transpose(
          val, (3, 2, 0, 1))  # HWIO -> OIHW
    elif parts[-1] == "scale":
      sd[".".join(parts[:-1] + ["weight"])] = val
    elif parts[-1] == "bias":
      sd[key] = val
    elif parts[-1] == "mean":
      sd[".".join(parts[:-1] + ["running_mean"])] = val
    elif parts[-1] == "var":
      sd[".".join(parts[:-1] + ["running_var"])] = val
  npz = tmp_path / "incep.npz"
  np.savez(npz, **sd)

  loaded = inception.convert_state_dict_npz(str(npz))
  jax.tree.map(np.testing.assert_array_equal,
               jax.tree.map(np.asarray, dict(variables["params"])),
               loaded["params"])
  feats2 = model.apply(loaded, jnp.zeros((2, 75, 75, 3)))
  np.testing.assert_allclose(np.asarray(feats), np.asarray(feats2))
