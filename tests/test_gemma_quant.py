"""Weight-only int8 serving quantization for the Gemma LM (beyond ref).

quantize_params must produce exactly the param tree Model(quant=True)
declares, across both layer layouts, and the quantized model must track
the float model closely (per-output-channel symmetric scales).
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from big_vision_tpu.models.ppp import gemma

# Multi-minute on the 1-CPU CI host (jit compiles dominate): heavy tier.
pytestmark = pytest.mark.heavy


TOKENS = np.array([[3, 7, 11, 2, 9, 1, 4, 5]], np.int32)


def _rand_params(model, seed=0):
  params = model.init(jax.random.PRNGKey(0), jnp.asarray(TOKENS))["params"]
  leaves, treedef = jax.tree.flatten(params)
  keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
  leaves = [jax.random.normal(k, x.shape, jnp.float32) * 0.05
            for k, x in zip(keys, leaves)]
  return jax.tree.unflatten(treedef, leaves)


@pytest.mark.parametrize("scan", [False, True])
def test_quantized_tree_matches_quant_model_init(scan):
  cfg = dict(gemma.get_config("gemma_test"), scan=scan)
  params = _rand_params(gemma.Model(**cfg))
  qparams = gemma.quantize_params(params)
  qinit = gemma.Model(**cfg, quant=True).init(
      jax.random.PRNGKey(0), jnp.asarray(TOKENS))["params"]
  got = jax.tree.map(lambda x: (x.shape, str(x.dtype)), qparams)
  want = jax.tree.map(lambda x: (x.shape, str(x.dtype)), qinit)
  assert got == want


def test_quantized_logits_track_float():
  cfg = dict(gemma.get_config("gemma_test"), scan=True)
  model = gemma.Model(**cfg)
  qmodel = gemma.Model(**cfg, quant=True)
  params = _rand_params(model)
  qparams = gemma.quantize_params(params)
  lf, _ = model.apply({"params": params}, jnp.asarray(TOKENS))
  lq, _ = qmodel.apply({"params": qparams}, jnp.asarray(TOKENS))
  lf, lq = np.asarray(lf), np.asarray(lq)
  rel = np.abs(lq - lf).max() / (np.abs(lf).max() + 1e-9)
  assert rel < 0.02, rel  # int8 per-channel: ~0.5% observed
  # Greedy decisions survive quantization on this model.
  assert (lf.argmax(-1) == lq.argmax(-1)).mean() >= 0.9


def test_quantization_is_idempotent():
  # dequantize(quantize(w)) lands exactly on the int8 grid, so a second
  # quantize round-trips bit-exactly: scales AND int8 codes are identical.
  cfg = dict(gemma.get_config("gemma_test"), scan=True)
  params = _rand_params(gemma.Model(**cfg))
  q1 = gemma.quantize_params(params)

  names = set()
  for (parent, leaf), (_, sname) in gemma._QUANT_LEAVES.items():
    names.add((parent, leaf, sname))

  def dequant_tree(tree):
    flat = jax.tree.flatten_with_path  # not needed; walk dict directly
    import flax
    f = flax.traverse_util.flatten_dict(flax.core.unfreeze(tree))
    out = {}
    for path, v in f.items():
      if v.dtype == jnp.int8:
        rule = gemma._QUANT_LEAVES[
            (path[-2] if len(path) > 1 else "", path[-1])]
        scale = f[path[:-1] + (rule[1],)]
        out[path] = v.astype(jnp.float32) * scale
      elif any(path[-1] == sname for _, _, sname in names):
        continue  # drop scales: back to the float layout
      else:
        out[path] = v
    return flax.traverse_util.unflatten_dict(out)

  q2 = gemma.quantize_params(dequant_tree(q1))
  jax.tree.map(lambda a, b: np.testing.assert_array_equal(
      np.asarray(a), np.asarray(b)), q1, q2)


def test_quantized_decode_runs_and_is_deterministic():
  from big_vision_tpu.models.proj.paligemma import paligemma
  from big_vision_tpu.models.proj.paligemma import predict_fns

  llm = dict(variant="gemma_test", scan=True, cache_dtype="bfloat16")
  img = dict(variant="mu/16", pool_type="none", posemb="sincos2d")
  model = paligemma.Model(img=img, llm=llm)
  image = jnp.zeros((2, 16, 16, 3), jnp.float32)
  text = jnp.ones((2, 6), jnp.int32)
  params = model.init(jax.random.PRNGKey(0), image, text,
                      jnp.zeros_like(text))["params"]
  params = dict(params, llm=gemma.quantize_params(params["llm"]))
  qmodel = paligemma.Model(img=img, llm=dict(llm, quant=True))
  fns = predict_fns.make_predict_fns(qmodel, max_decode_len=5, eos_token=-1,
                                     sampler="greedy")
  batch = {"image": image, "text": text,
           "mask_input": jnp.ones_like(text, bool),
           "mask_ar": jnp.zeros_like(text)}
  a = np.asarray(fns["decode"]({"params": params}, batch, max_decode_len=5))
  b = np.asarray(fns["decode"]({"params": params}, batch, max_decode_len=5))
  assert a.shape == (2, 5)
  np.testing.assert_array_equal(a, b)


def _decode_tokens(llm, params, n=6):
  """Greedy PaliGemma decode with the given llm config; returns tokens."""
  from big_vision_tpu.models.proj.paligemma import paligemma
  from big_vision_tpu.models.proj.paligemma import predict_fns

  img = dict(variant="mu/16", pool_type="none", posemb="sincos2d")
  model = paligemma.Model(img=img, llm=llm)
  image = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
  text = jnp.ones((2, 6), jnp.int32)
  if params is None:
    params = model.init(jax.random.PRNGKey(0), image, text,
                        jnp.zeros_like(text))["params"]
  fns = predict_fns.make_predict_fns(model, max_decode_len=n, eos_token=-1,
                                     sampler="greedy")
  batch = {"image": image, "text": text,
           "mask_input": jnp.ones_like(text, bool),
           "mask_ar": jnp.zeros_like(text)}
  toks = fns["decode"]({"params": params}, batch, max_decode_len=n)
  return np.asarray(toks), params


def test_int8_kv_cache_tracks_float_cache():
  llm_f = dict(variant="gemma_test", scan=True, cache_dtype="float32")
  toks_f, params = _decode_tokens(llm_f, None)
  toks_q, _ = _decode_tokens(dict(llm_f, cache_dtype="int8"), params)
  # Per-(slot, head) int8 KV: greedy paths agree on this model.
  assert (toks_f == toks_q).mean() >= 0.9, (toks_f, toks_q)


def test_int8_kv_cache_tree_dtypes():
  cfg = dict(gemma.get_config("gemma_test"), scan=True, cache_dtype="int8")
  model = gemma.Model(**cfg)
  tokens = jnp.asarray(TOKENS)
  mask = jnp.ones((1, 1, tokens.shape[1], 16), bool)
  pos = jnp.arange(tokens.shape[1])[None]
  vars_ = model.init(jax.random.PRNGKey(0), tokens, positions=pos,
                     mask=mask, decode=True)
  flat = flax.traverse_util.flatten_dict(flax.core.unfreeze(vars_["cache"]))
  dtypes = {path[-1]: str(v.dtype) for path, v in flat.items()}
  assert dtypes["k_cache"] == "int8" and dtypes["v_cache"] == "int8"
  assert dtypes["k_scale"] == "float32" and dtypes["v_scale"] == "float32"


def test_quantize_ckpt_cli_roundtrip(tmp_path):
  """npz -> quantize_ckpt CLI (scan->unrolled) -> serving model loads it."""
  from big_vision_tpu.tools import quantize_ckpt
  from big_vision_tpu.utils import checkpoints

  cfg = dict(gemma.get_config("gemma_test"), scan=True)
  params = _rand_params(gemma.Model(**cfg))
  src = str(tmp_path / "float.npz")
  dst = str(tmp_path / "int8.npz")
  checkpoints.npz_save({"llm": params}, src)

  quantize_ckpt.main(["--ckpt", src, "--subtree", "llm", "--out", dst,
                      "--layout", "unrolled"])

  import big_vision_tpu.utils as u
  loaded = u.load_params(dst)["llm"]
  qinit = gemma.Model(**dict(cfg, scan=False), quant=True).init(
      jax.random.PRNGKey(0), jnp.asarray(TOKENS))["params"]
  got = jax.tree.map(lambda x: (x.shape, str(np.asarray(x).dtype)), loaded)
  want = jax.tree.map(lambda x: (x.shape, str(x.dtype)), qinit)
  assert got == want
  # And the values are the same quantization the in-memory path produces.
  ref = quantize_ckpt.quantize_tree(params, "unrolled")
  jax.tree.map(lambda a, b: np.testing.assert_array_equal(
      np.asarray(a), np.asarray(b)), loaded, ref)


def test_int8_decode_under_tensor_parallel_sharding():
  """Serving the quantized model TP-sharded (megatron FFW split + scales)
  on a data x model mesh reproduces the replicated decode."""
  import big_vision_tpu.utils as u
  from big_vision_tpu import sharding

  from big_vision_tpu.models.proj.paligemma import paligemma, predict_fns
  llm = dict(variant="gemma_test", scan=False, cache_dtype="int8")
  img = dict(variant="mu/16", pool_type="none", posemb="sincos2d")
  image = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))
  text = jnp.ones((8, 6), jnp.int32)
  params = paligemma.Model(img=img, llm=llm).init(
      jax.random.PRNGKey(0), image, text, jnp.zeros_like(text))["params"]
  qparams = gemma.quantize_params(params["llm"])

  mesh = u.create_device_mesh([("data", 4), ("model", 2)])
  strategy = [
      (".*gating_einsum(_scale)?$", "shard_dim('model', -1)"),
      (".*/linear$", "shard_dim('model', 0)"),
      (".*", "replicate"),
  ]
  llm_sh = sharding.infer_sharding(qparams, strategy, mesh)
  img_sh = jax.tree.map(
      lambda _: jax.NamedSharding(mesh, jax.sharding.PartitionSpec()),
      params["img"])
  qp = {"img": jax.device_put(params["img"], img_sh),
        "llm": jax.device_put(qparams, llm_sh)}

  qmodel = paligemma.Model(img=img, llm=dict(llm, quant=True))
  fns = predict_fns.make_predict_fns(qmodel, max_decode_len=4,
                                     eos_token=-1, sampler="greedy")
  data = jax.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
  batch = jax.device_put(
      {"image": image, "text": text,
       "mask_input": jnp.ones_like(text, bool),
       "mask_ar": jnp.zeros_like(text)}, data)
  toks_tp = np.asarray(fns["decode"]({"params": qp}, batch,
                                     max_decode_len=4))
  repl = jax.NamedSharding(mesh, jax.sharding.PartitionSpec())
  qp_repl = jax.device_put({"img": params["img"], "llm": qparams}, repl)
  toks_q = np.asarray(fns["decode"]({"params": qp_repl}, batch,
                                    max_decode_len=4))
  assert toks_tp.shape == (8, 4)
  # TP reduction order can perturb logits at f32 epsilon; greedy paths
  # must still agree nearly everywhere.
  assert (toks_tp == toks_q).mean() >= 0.9, (toks_tp, toks_q)


def test_load_auto_quantizes_float_ckpt_into_quant_target(tmp_path):
  """gemma.load detects a quant=True init tree (int8 leaves) and converts a
  float checkpoint on the fly, like its scan<->pyloop auto-conversion."""
  from big_vision_tpu.utils import checkpoints

  cfg = dict(gemma.get_config("gemma_test"), scan=True)
  params = _rand_params(gemma.Model(**cfg))
  src = str(tmp_path / "float.npz")
  checkpoints.npz_save(params, src)

  qinit = gemma.Model(**dict(cfg, scan=False), quant=True).init(
      jax.random.PRNGKey(0), jnp.asarray(TOKENS))["params"]
  loaded = gemma.load(qinit, src, dict(cfg, scan=False))
  want = gemma.quantize_params(gemma.scan_to_pyloop(params))
  jax.tree.map(lambda a, b: np.testing.assert_array_equal(
      np.asarray(a), np.asarray(b)), loaded, want)


def test_quantized_param_bytes_shrink():
  cfg = dict(gemma.get_config("gemma_test"), scan=True)
  params = _rand_params(gemma.Model(**cfg))
  bytes_f = sum(np.asarray(x).nbytes for x in jax.tree.leaves(params))
  q = gemma.quantize_params(params)
  bytes_q = sum(np.asarray(x).nbytes for x in jax.tree.leaves(q))
  # f32 -> int8 + scales: ~4x smaller (bf16 serving would be ~2x).
  assert bytes_q < 0.35 * bytes_f, (bytes_q, bytes_f)
