"""Fused Pallas decode-attention kernel (ops/decode_attention.py).

Two layers of checks:
  1. Kernel vs a jnp transcription of the same math (bit-level wiring:
     grouped heads, per-slot scales, softcap, ragged masks, G/S padding).
  2. End-to-end gemma decode: Model(decode_impl="flash") must track
     Model(decode_impl="xla") through prefill + several AR steps, for
     both bf16/f32 and int8 KV caches.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from big_vision_tpu.models.ppp import gemma
from big_vision_tpu.ops import decode_attention as da


def _ref(q, k, v, mask, k_scale=None, v_scale=None, softcap=0.0):
  """Same math as the kernel, plain jnp (matching bf16 operand casts)."""
  cd = jnp.bfloat16
  s = jnp.einsum("bkgh,bksh->bkgs", q.astype(cd), k.astype(cd),
                 preferred_element_type=jnp.float32)
  if k_scale is not None:
    s = s * k_scale[:, :, None, :, 0]
  if softcap:
    s = softcap * jnp.tanh(s / softcap)
  valid = mask[:, None, None, :]
  s = jnp.where(valid, s, -1e30)
  m = jnp.max(s, axis=-1, keepdims=True)
  p = jnp.where(valid, jnp.exp(s - m), 0.0)
  l = jnp.sum(p, axis=-1, keepdims=True)
  l = jnp.where(l == 0, 1.0, l)
  if v_scale is not None:
    p = p * v_scale[:, :, None, :, 0]
  o = jnp.einsum("bkgs,bksh->bkgh", p.astype(cd), v.astype(cd),
                 preferred_element_type=jnp.float32)
  return (o / l).astype(q.dtype)


def _mk(b, kh, g, s, h, quant, seed=0):
  rs = np.random.RandomState(seed)
  q = jnp.asarray(rs.randn(b, kh, g, h), jnp.float32)
  kf = jnp.asarray(rs.randn(b, kh, s, h), jnp.float32)
  vf = jnp.asarray(rs.randn(b, kh, s, h), jnp.float32)
  # Ragged live lengths per example, incl. a fully-masked row.
  lengths = [max(1, s - 1 - 3 * i) for i in range(b)]
  lengths[-1] = 0 if b > 2 else lengths[-1]
  mask = jnp.asarray(np.arange(s)[None, :] < np.array(lengths)[:, None])
  if not quant:
    return q, kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16), mask, None, None
  (kq, ks), (vq, vs) = gemma._quant_kv(kf), gemma._quant_kv(vf)
  return q, kq, vq, mask, ks, vs


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("kh,g", [(1, 8), (4, 2), (2, 3)])
def test_kernel_matches_reference_math(quant, kh, g):
  q, k, v, mask, ks, vs = _mk(3, kh, g, 140, 64, quant)  # S pads to 256
  got = da.decode_attention(q, k, v, mask, k_scale=ks, v_scale=vs)
  want = _ref(q, k, v, mask, k_scale=ks, v_scale=vs)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=0, atol=1e-5)


def test_kernel_softcap():
  q, k, v, mask, ks, vs = _mk(2, 2, 4, 64, 32, True, seed=1)
  got = da.decode_attention(q, k, v, mask, k_scale=ks, v_scale=vs,
                            logits_softcap=50.0)
  want = _ref(q, k, v, mask, k_scale=ks, v_scale=vs, softcap=50.0)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=0, atol=1e-5)
  # Softcap must actually change the result (guards a dropped arg).
  uncapped = da.decode_attention(q, k, v, mask, k_scale=ks, v_scale=vs)
  assert np.abs(np.asarray(got) - np.asarray(uncapped)).max() > 1e-4


def test_fully_masked_rows_emit_zeros():
  q, k, v, _, _, _ = _mk(2, 1, 8, 32, 16, False)
  mask = jnp.zeros((2, 32), bool)
  got = da.decode_attention(q, k, v, mask)
  assert np.abs(np.asarray(got)).max() == 0.0


def test_fits_gate():
  assert da.fits(4352, 256, 1)          # the SERVING xl_t int8 shape
  assert da.fits(4352, 256, 2)          # and its bf16 sibling
  assert not da.fits(200_000, 256, 2)   # far beyond VMEM


def _run_decode(cache_dtype, decode_impl, steps=3):
  cfg = dict(gemma.get_config("gemma_test"), scan=False,
             cache_dtype=cache_dtype, decode_impl=decode_impl)
  model = gemma.Model(**cfg)
  b, t, cache = 2, 5, 10
  tokens = jnp.asarray(np.random.RandomState(0).randint(1, 255, (b, t)))
  params = model.init(jax.random.PRNGKey(0), tokens)["params"]
  params = jax.tree.map(
      lambda x: jax.random.normal(jax.random.PRNGKey(x.size % 97), x.shape,
                                  jnp.float32) * 0.05, params)

  causal = np.tril(np.ones((t, t), bool))
  mask = np.zeros((b, 1, t, cache), bool)
  mask[:, :, :, :t] = causal
  (logits, _), cvars = model.apply(
      {"params": params}, tokens, positions=jnp.arange(t)[None, :] * 1,
      mask=jnp.asarray(mask), decode=True, mutable=["cache"])
  outs = [np.asarray(logits[:, -1], np.float32)]
  tok = jnp.argmax(logits[:, -1:], -1)
  for i in range(steps):
    pos = t + i
    mstep = np.zeros((b, 1, 1, cache), bool)
    mstep[:, :, :, :pos + 1] = True
    (logits, _), cvars = model.apply(
        {"params": params, **cvars}, tok,
        positions=jnp.full((b, 1), pos, jnp.int32),
        mask=jnp.asarray(mstep), decode=True, mutable=["cache"])
    outs.append(np.asarray(logits[:, 0], np.float32))
    tok = jnp.argmax(logits[:, -1:], -1)
  return outs


@pytest.mark.parametrize("cache_dtype", [None, "int8"])
def test_gemma_decode_flash_tracks_xla(cache_dtype):
  xla = _run_decode(cache_dtype, "xla")
  fla = _run_decode(cache_dtype, "flash")
  for a, b in zip(xla, fla):
    scale = np.abs(a).max() + 1e-9
    # bf16-operand attention either way; diffs are accumulation order.
    assert np.abs(a - b).max() / scale < 2e-2, np.abs(a - b).max() / scale
    assert (a.argmax(-1) == b.argmax(-1)).mean() >= 0.9
