"""Gemma / PaliGemma tests on the tiny test variant."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from big_vision_tpu.models.ppp import gemma
from big_vision_tpu.models.proj.paligemma import (gemma_bv, paligemma,
                                                  predict_fns)

# Multi-minute on the 1-CPU CI host (jit compiles dominate): heavy tier.
pytestmark = pytest.mark.heavy


VOCAB = 256


def tiny_lm(scan=True):
  cfg = gemma.get_config("gemma_test")
  cfg.scan = scan
  model = gemma.Model(**cfg)
  toks = jnp.ones((2, 8), jnp.int32)
  params = model.init(jax.random.PRNGKey(0), toks)["params"]
  return model, params


def test_gemma_forward_shapes():
  model, params = tiny_lm()
  toks = jnp.arange(16, dtype=jnp.int32).reshape(2, 8) % VOCAB
  logits, out = model.apply({"params": params}, toks)
  assert logits.shape == (2, 8, VOCAB)
  assert out["pre_logits"].shape == (2, 8, 32)


def test_gemma_causality():
  """Changing a future token must not change past logits."""
  model, params = tiny_lm()
  t1 = jnp.asarray([[5, 6, 7, 8, 9, 10, 11, 12]], jnp.int32)
  t2 = t1.at[0, 5].set(99)
  l1, _ = model.apply({"params": params}, t1)
  l2, _ = model.apply({"params": params}, t2)
  np.testing.assert_allclose(l1[0, :5], l2[0, :5], atol=1e-5)
  assert not np.allclose(l1[0, 5], l2[0, 5], atol=1e-5)


def test_gemma_scan_matches_loop():
  cfg = gemma.get_config("gemma_test")
  cfg.scan = True
  m_scan = gemma.Model(**cfg)
  toks = jnp.ones((1, 6), jnp.int32) * 3
  p_scan = m_scan.init(jax.random.PRNGKey(0), toks)["params"]
  # Convert stacked scan params to per-layer and run the loop model.
  cfg2 = gemma.get_config("gemma_test")
  cfg2.scan = False
  m_loop = gemma.Model(**cfg2)
  p_loop = jax.tree.map(lambda x: x, p_scan)
  stacked = p_loop["layers"]
  p_loop["layers"] = {
      str(i): jax.tree.map(lambda x, i=i: x[i], stacked) for i in range(2)}
  l_scan, _ = m_scan.apply({"params": p_scan}, toks)
  l_loop, _ = m_loop.apply({"params": p_loop}, toks)
  np.testing.assert_allclose(l_scan, l_loop, atol=1e-5)


def test_gemma2_softcap_and_postnorms():
  cfg = gemma.get_config("gemma_test")
  cfg.final_logits_softcap = 30.0
  cfg.attn_logits_softcap = 50.0
  cfg.post_norms = True
  model = gemma.Model(**cfg)
  toks = jnp.ones((1, 4), jnp.int32)
  params = model.init(jax.random.PRNGKey(0), toks)["params"]
  logits, _ = model.apply({"params": params}, toks)
  assert float(jnp.max(jnp.abs(logits))) <= 30.0


def test_make_attn_mask():
  input_mask = jnp.asarray([[1, 1, 1, 1, 0]], bool)
  mask_ar = jnp.asarray([[0, 0, 1, 1, 1]], jnp.int32)
  m = np.asarray(paligemma.make_attn_mask(input_mask, mask_ar))[0]
  # Prefix tokens (0, 1) attend to each other bidirectionally.
  assert m[0, 1] and m[1, 0]
  # AR token 2 attends to prefix + itself, not to 3.
  assert m[2, 0] and m[2, 2] and not m[2, 3]
  assert m[3, 2] and m[3, 3]
  # Nothing attends to padding (4), and padding attends to nothing.
  assert not m[:, 4].any() and not m[4, :].any()


def make_tiny_pg(scan=True):
  model = paligemma.Model(
      img=dict(variant="mu/16", pool_type="none", posemb="sincos2d",
               head_zeroinit=False),
      llm=dict(variant="gemma_test", scan=scan, cache_dtype=None))
  img = jnp.zeros((2, 16, 16, 3))
  txt = jnp.ones((2, 6), jnp.int32)
  mask_ar = jnp.ones((2, 6), jnp.int32)
  params = model.init(jax.random.PRNGKey(0), img, txt, mask_ar)["params"]
  return model, params, img, txt


def test_paligemma_forward():
  model, params, img, txt = make_tiny_pg()
  logits, out = model.apply({"params": params}, img, txt,
                            jnp.ones_like(txt))
  assert logits.shape == (2, 6, VOCAB)
  assert out["img/zimg"].shape[0] == 2


@pytest.mark.parametrize("scan", [True, False])
def test_prefill_extend_matches_full_forward(scan):
  """The fast KV-cache path must reproduce the full-recompute logits.

  Covers BOTH layer layouts: scan (stacked cache [L,B,S,H,D]) and
  per-layer pyloop (cache [B,S,H,D]) — reference gemma_bv supports both.
  """
  model, params, img, txt = make_tiny_pg(scan=scan)
  variables = {"params": params}
  input_mask = jnp.asarray([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], bool)
  mask_ar = jnp.ones_like(txt)

  (x, full_mask, full_ar), _ = model.apply(
      variables, img, txt, input_mask=input_mask, mask_ar=mask_ar,
      method=model.embed_image_and_text)

  logits_pre, cache = model.apply(
      variables, x, full_mask, full_ar, cache_size=x.shape[1] + 4,
      method=model.prefill_cache, mutable=["cache"])

  # Oracle: full forward; last valid position logits.
  attn = paligemma.make_attn_mask(full_mask, full_ar)
  logits_all, _ = model.apply(variables, x, attn,
                              method=lambda m, x, mask: m._llm(x, mask=mask))
  last = np.asarray(jnp.sum(full_mask, axis=1)) - 1
  want = np.stack([np.asarray(logits_all)[i, last[i]] for i in range(2)])
  np.testing.assert_allclose(np.asarray(logits_pre)[:, 0], want, atol=1e-4)

  # Extend by one token; compare against recomputing with appended token.
  new_tok = jnp.asarray([[7], [9]], jnp.int32)
  emb = model.apply(variables, new_tok, method=model.embed_text)[0]
  logits_ext, _ = model.apply({**variables, **cache}, emb,
                              method=model.extend_cache, mutable=["cache"])
  # Oracle: append the token at the first padding slot per example.
  txt2 = np.array(txt)  # writable copies
  im2 = np.array(input_mask)
  for i in range(2):
    pos = int(im2[i].sum())
    if pos < txt2.shape[1]:
      txt2[i, pos] = int(new_tok[i, 0])
      im2[i, pos] = True
    else:
      txt2 = np.pad(txt2, ((0, 0), (0, 1)))
      txt2[i, -1] = int(new_tok[i, 0])
      im2 = np.pad(im2, ((0, 0), (0, 1)), constant_values=False)
      im2[i, -1] = True
  # Simplest consistent oracle: both examples get same new length by
  # padding; rebuild and take the last valid position.
  txt2 = jnp.asarray(txt2)
  im2 = jnp.asarray(im2)
  ar2 = jnp.ones_like(txt2)
  (x2, fm2, fa2), _ = model.apply(
      variables, img, txt2, input_mask=im2, mask_ar=ar2,
      method=model.embed_image_and_text)
  attn2 = paligemma.make_attn_mask(fm2, fa2)
  logits_all2, _ = model.apply(variables, x2, attn2,
                               method=lambda m, x, mask: m._llm(x, mask=mask))
  last2 = np.asarray(jnp.sum(fm2, axis=1)) - 1
  want2 = np.stack([np.asarray(logits_all2)[i, last2[i]] for i in range(2)])
  np.testing.assert_allclose(np.asarray(logits_ext)[:, 0], want2, atol=1e-4)


def test_jitted_decode_runs_and_stops_at_eos():
  model, params, img, txt = make_tiny_pg()
  fns = predict_fns.make_predict_fns(model, max_decode_len=8, eos_token=1,
                                     sampler="greedy")
  batch = {"image": img, "text": txt,
           "mask_input": jnp.ones_like(txt, bool),
           "mask_ar": jnp.zeros_like(txt)}
  tokens, logp = fns["decode_with_logp"]({"params": params}, batch)
  assert tokens.shape == (2, 8)
  assert logp.shape == (2,)
  # Greedy decode is deterministic.
  tokens2 = fns["decode"]({"params": params}, batch)
  np.testing.assert_array_equal(np.asarray(tokens), np.asarray(tokens2))


def test_samplers():
  logits = jnp.asarray([[0.0, 5.0, 1.0, -2.0]])
  rng = jax.random.PRNGKey(0)
  assert int(predict_fns.get_sampler("greedy")(logits, rng)[0]) == 1
  t = predict_fns.get_sampler("temperature(0.0001)")(logits, rng)
  assert int(t[0]) == 1
  n = predict_fns.get_sampler("nucleus(0.1)")(logits, rng)
  assert int(n[0]) == 1  # tiny p keeps only the argmax
  k = predict_fns.get_sampler("topk(1)")(logits, rng)
  assert int(k[0]) == 1


def test_beam_decode_beats_or_matches_greedy():
  """Beam-1 equals greedy; larger beams never have lower sequence logp."""
  model, params, img, txt = make_tiny_pg()
  batch = {"image": img, "text": txt,
           "mask_input": jnp.ones_like(txt, bool),
           "mask_ar": jnp.zeros_like(txt)}

  fns1 = predict_fns.make_predict_fns(model, max_decode_len=6, eos_token=1,
                                      sampler="greedy", beam_size=1)
  greedy_tokens, greedy_logp = fns1["decode_with_logp"]({"params": params},
                                                        batch)
  beam1 = fns1["beam_decode"]({"params": params}, batch)
  np.testing.assert_array_equal(np.asarray(beam1),
                                np.asarray(greedy_tokens))

  fns3 = predict_fns.make_predict_fns(model, max_decode_len=6, eos_token=1,
                                      beam_size=3)
  beam3, scores3 = jax.jit(
      lambda p, b: predict_fns._beam_decode_jit(
          p, b, model=model, max_decode_len=6, eos_token=1,
          beam_size=3))(params, batch)
  assert beam3.shape == (2, 6)
  # Beam search maximizes sequence logp: >= greedy's, up to numerics.
  assert np.all(np.asarray(scores3) >= np.asarray(greedy_logp) - 1e-4)
  del fns3


def test_flash_seg_training_forward_matches_xla():
  """llm attn_impl='flash' (fused seg-masked kernel) == xla forward."""
  def build(attn_impl):
    return paligemma.Model(
        img=dict(variant="mu/16", pool_type="none", posemb="sincos2d",
                 head_zeroinit=False),
        llm=dict(variant="gemma_test", scan=True, cache_dtype=None,
                 attn_impl=attn_impl))

  m_x, m_f = build("xla"), build("flash")
  img = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 3),
                    jnp.float32)
  txt = jnp.asarray([[3, 4, 5, 1, 0, 0], [5, 6, 7, 8, 9, 1]], jnp.int32)
  mask_ar = jnp.asarray([[0, 0, 1, 1, 1, 1], [0, 1, 1, 1, 1, 1]],
                        jnp.int32)
  params = m_x.init(jax.random.PRNGKey(0), img, txt, mask_ar)["params"]

  lx, _ = m_x.apply({"params": params}, img, txt, mask_ar)
  lf, _ = m_f.apply({"params": params}, img, txt, mask_ar)
  np.testing.assert_allclose(np.asarray(lf), np.asarray(lx), atol=2e-4)

  # Gradients agree too (the fused backward).
  def loss(m):
    def f(p):
      logits, _ = m.apply({"params": p}, img, txt, mask_ar, train=True)
      return jnp.sum(logits.astype(jnp.float32) ** 2) / logits.size
    return f
  gx = jax.grad(loss(m_x))(params)
  gf = jax.grad(loss(m_f))(params)
  import big_vision_tpu.utils as u
  nx, _ = u.tree_flatten_with_names(gx)
  nf, _ = u.tree_flatten_with_names(gf)
  for (ka, a), (kb, b) in zip(sorted(nx), sorted(nf)):
    assert ka == kb
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4,
                               err_msg=ka)


def test_gemma_scan_pyloop_param_conversion():
  """scan_to_pyloop/pyloop_to_scan round-trip, and load() converts a
  scan-layout checkpoint into a scan=False model (the serving layout:
  unrolled decode measures ~2.2x faster than scan on TPU)."""
  import numpy as np

  from big_vision_tpu.models.ppp import gemma

  tokens = jnp.ones((2, 5), jnp.int32)
  cfg = gemma.get_config("gemma_test")
  cfg.scan = True
  m_scan = gemma.Model(**cfg)
  p_scan = m_scan.init(jax.random.PRNGKey(0), tokens)["params"]
  cfg2 = gemma.get_config("gemma_test")
  cfg2.scan = False
  m_loop = gemma.Model(**cfg2)
  p_loop = m_loop.init(jax.random.PRNGKey(1), tokens)["params"]

  # Round-trip conversion preserves values.
  rt = gemma.pyloop_to_scan(gemma.scan_to_pyloop(p_scan))
  jax.tree.map(np.testing.assert_array_equal, p_scan, rt)

  # The converters produce working params for the other layout.
  converted = gemma.scan_to_pyloop(jax.device_get(p_scan))
  out_scan, _ = m_scan.apply({"params": p_scan}, tokens)
  out_loop, _ = m_loop.apply({"params": converted}, tokens)
  np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_loop),
                             atol=1e-5)

  # load(): an npz saved from a scan model merges into a pyloop model
  # (and vice versa) via automatic layout conversion.
  import tempfile, os
  import big_vision_tpu.utils as u
  with tempfile.TemporaryDirectory() as d:
    path = os.path.join(d, "ckpt.npz")
    u.npz_save(jax.device_get(p_scan), path)
    merged = gemma.load(jax.device_get(p_loop), path, dict(cfg2))
    out_merged, _ = m_loop.apply({"params": merged}, tokens)
    np.testing.assert_allclose(np.asarray(out_scan),
                               np.asarray(out_merged), atol=1e-5)


def test_cache_extra_padding_does_not_change_greedy_decode():
  """Over-allocated (masked) KV slots must be read-invisible.

  cache_extra pads the cache beyond prefill+decode so serving benches can
  measure long-context decode cost without a long prefill; the padded
  slots are never written and must be denied by the cache mask, so the
  decoded tokens and logp must be bit-identical to cache_extra=0.
  """
  model, params, img, txt = make_tiny_pg()
  batch = {"image": img, "text": txt,
           "mask_input": jnp.ones_like(txt, bool),
           "mask_ar": jnp.zeros_like(txt)}
  fns0 = predict_fns.make_predict_fns(model, max_decode_len=8, eos_token=1,
                                      sampler="greedy")
  fns7 = predict_fns.make_predict_fns(model, max_decode_len=8, eos_token=1,
                                      sampler="greedy", cache_extra=7)
  t0, lp0 = fns0["decode_with_logp"]({"params": params}, batch)
  t7, lp7 = fns7["decode_with_logp"]({"params": params}, batch)
  np.testing.assert_array_equal(np.asarray(t0), np.asarray(t7))
  np.testing.assert_array_equal(np.asarray(lp0), np.asarray(lp7))
