#!/usr/bin/env python
"""SERVING_r05: same-phase bf16-vs-int8 decode pairs + gemma2 GQA long-T rows.

Fixes SERVING_r04's phase-confound (its int8 row landed in a throttled
bandwidth phase while bf16 rode a fast one): here the bf16 and int8 decode
fns are BOTH compiled up front and then timed in back-to-back interleaved
windows (bf16,int8,bf16,int8,...), so each pair shares one platform phase
and the tok/s ratio is directly comparable against the weight-byte ratio.

Second section: gemma2 GQA (num_kv_heads < num_heads) at long context with
bf16 vs int8 KV cache — once batch*T*layers*kv_heads*head_dim rivals the
weight bytes, the cache read dominates and int8 KV (halved cache bytes)
shows up in the AR step (ref gemma.py:161-195 is the cache contract our
cache layout mirrors).

Usage:
    python tools/run_serving.py [--pairs 3] [--out SERVING_r05.json]
    python tools/run_serving.py --tiny     # CPU smoke (gemma_test)
"""
import argparse
import datetime
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp


def _fetch(x):
  return float(jax.device_get(jnp.asarray(x).ravel()[0]))


def build(variant, img_variant, res, batch, prefill_len, decode_len,
          quant=None, cache_dtype="bfloat16", base_params=None,
          cache_extra=0, decode_impl="xla"):
  """Returns (decode_fn(iters, decode_len) -> wall_s, meta, params)."""
  from big_vision_tpu.models.ppp import gemma
  from big_vision_tpu.models.proj.paligemma import paligemma
  from big_vision_tpu.models.proj.paligemma import predict_fns

  img = dict(variant=img_variant, pool_type="none", scan=True,
             dtype_mm="bfloat16")
  llm = dict(variant=variant, scan=False, cache_dtype=cache_dtype,
             decode_impl=decode_impl)
  rng = jax.random.PRNGKey(0)
  image = jnp.zeros((batch, res, res, 3), jnp.float32)
  text = jnp.ones((batch, prefill_len), jnp.int32)
  batch_d = {"image": image, "text": text,
             "mask_input": jnp.ones_like(text, bool),
             "mask_ar": jnp.zeros_like(text)}

  t0 = time.perf_counter()
  if base_params is None:
    model = paligemma.Model(img=img, llm=llm)
    params = jax.jit(lambda k: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        model.init(k, image[:1], text[:1],
                   jnp.zeros_like(text[:1]))["params"]))(rng)
  else:
    params = base_params
  if quant == "int8":
    params = dict(params, llm=jax.jit(gemma.quantize_params)(params["llm"]))
    llm = dict(llm, quant=True)
  model = paligemma.Model(img=img, llm=llm)
  _fetch(jax.tree.leaves(params)[0])
  init_s = time.perf_counter() - t0

  fns = predict_fns.make_predict_fns(model, max_decode_len=decode_len,
                                     eos_token=-1, sampler="greedy",
                                     cache_extra=cache_extra)
  state = {"params": params}

  def run(decode_len_, iters=1):
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
      out = fns["decode"](state, batch_d, rng=jax.random.PRNGKey(i),
                          max_decode_len=decode_len_)
    _fetch(out)
    return time.perf_counter() - t0

  # Compile both lengths now so timed windows are compile-free.
  half = max(decode_len // 2, 1)
  run(decode_len)
  run(half)

  param_bytes = sum(x.size * x.dtype.itemsize
                    for x in jax.tree.leaves(params))
  meta = dict(llm_variant=variant, llm_quant=quant, cache_dtype=cache_dtype,
              img_variant=img_variant, res=res, batch=batch,
              prefill_len=prefill_len, decode_len=decode_len,
              cache_extra=cache_extra, decode_impl=decode_impl,
              param_bytes=param_bytes, init_s=round(init_s, 1))
  return run, half, meta, params


def measure(run, decode_len, half, iters):
  """Two-point regression: t(L) = prefill + L*step."""
  t_full = run(decode_len, iters) / iters
  t_half = run(half, iters) / iters
  dt = t_full - t_half
  if dt <= 0:
    return dict(t_full_s=t_full, t_half_s=t_half, ar_step_ms=None,
                tok_per_sec=None)
  step = dt / (decode_len - half)
  return dict(t_full_s=round(t_full, 4), t_half_s=round(t_half, 4),
              ar_step_ms=round(step * 1e3, 3))


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--pairs", type=int, default=3)
  ap.add_argument("--iters", type=int, default=3)
  ap.add_argument("--tiny", action="store_true")
  ap.add_argument("--skip_gemma2", action="store_true")
  ap.add_argument("--skip_pairs", action="store_true")
  ap.add_argument("--xl_t", action="store_true",
                  help="add the T~4.3k cache-bound crossover section")
  ap.add_argument("--flash", action="store_true",
                  help="add the xla-vs-Pallas decode_impl section at T~4.3k")
  ap.add_argument("--cpu", action="store_true",
                  help="force the CPU backend (the axon TPU plugin "
                       "overrides JAX_PLATFORMS=cpu, so --tiny smokes "
                       "silently run over the tunnel without this)")
  ap.add_argument("--merge_into", default=None,
                  help="read this existing artifact and only add/replace "
                       "the sections this invocation runs")
  ap.add_argument("--out", default=os.path.join(REPO, "SERVING_r05.json"))
  args = ap.parse_args()
  if args.cpu:
    jax.config.update("jax_platforms", "cpu")

  if args.tiny:
    base = dict(variant="gemma_test", img_variant="mu/16", res=32,
                batch=2, prefill_len=8, decode_len=16)
    long_t = dict(variant="gemma_test", img_variant="mu/16", res=32,
                  batch=2, prefill_len=16, decode_len=16)
  else:
    base = dict(variant="gemma_2b", img_variant="B/16", res=224,
                batch=8, prefill_len=32, decode_len=64)
    # Long context: cache bytes/example rival weight bytes -> cache-bound.
    long_t = dict(variant="gemma2_2b", img_variant="B/16", res=224,
                  batch=8, prefill_len=640, decode_len=384)

  result = {"date": str(datetime.date.today()),
            "device": jax.devices()[0].device_kind,
            "interleaved_pairs": [], "gemma2_gqa_long_t": []}
  if args.merge_into and os.path.exists(args.merge_into):
    with open(args.merge_into) as f:
      result.update({k: v for k, v in json.load(f).items()
                     if k not in ("date", "device")})

  # --- Section 1: same-phase interleaved bf16/int8 pairs -----------------
  if not args.skip_pairs:
    result["interleaved_pairs"] = []
    print("building bf16 ...", flush=True)
    run_bf16, half, meta_bf16, params = build(**base)
    print("building int8 (reuses bf16 params) ...", flush=True)
    run_int8, _, meta_int8, _ = build(**base, quant="int8",
                                      base_params=params)
    byte_ratio = meta_bf16["param_bytes"] / meta_int8["param_bytes"]

    for pair in range(args.pairs):
      a = measure(run_bf16, base["decode_len"], half, args.iters)
      b = measure(run_int8, base["decode_len"], half, args.iters)
      row = {"pair": pair, "bf16": a, "int8": b}
      if a["ar_step_ms"] and b["ar_step_ms"]:
        row["step_ratio_bf16_over_int8"] = round(
            a["ar_step_ms"] / b["ar_step_ms"], 3)
        row["bf16_tok_per_sec"] = round(
            base["batch"] / (a["ar_step_ms"] / 1e3), 1)
        row["int8_tok_per_sec"] = round(
            base["batch"] / (b["ar_step_ms"] / 1e3), 1)
      result["interleaved_pairs"].append(row)
      print(json.dumps(row), flush=True)
    result["weight_byte_ratio_bf16_over_int8"] = round(byte_ratio, 3)
    result["meta_bf16"] = meta_bf16
    result["meta_int8"] = meta_int8

  # --- Section 2: gemma2 GQA long-T, bf16 vs int8 KV cache ---------------
  if not args.skip_gemma2:
    result["gemma2_gqa_long_t"] = []
    print("building gemma2 GQA long-T (bf16 cache) ...", flush=True)
    run_c16, half2, meta_c16, params2 = build(**long_t)
    print("building gemma2 GQA long-T (int8 cache) ...", flush=True)
    run_c8, _, meta_c8, _ = build(**long_t, cache_dtype="int8",
                                  base_params=params2)
    for pair in range(max(args.pairs - 1, 1)):
      a = measure(run_c16, long_t["decode_len"], half2, args.iters)
      b = measure(run_c8, long_t["decode_len"], half2, args.iters)
      row = {"pair": pair, "kv_bf16": a, "kv_int8": b}
      if a["ar_step_ms"] and b["ar_step_ms"]:
        row["step_ratio_kvbf16_over_kvint8"] = round(
            a["ar_step_ms"] / b["ar_step_ms"], 3)
      result["gemma2_gqa_long_t"].append(row)
      print(json.dumps(row), flush=True)
    result["meta_kv_bf16"] = meta_c16
    result["meta_kv_int8"] = meta_c8

  # --- Section 3: gemma2 GQA T~4.3k — the cache-bound crossover ----------
  # At T=1024 (section 2) the KV cache is ~14% of per-step HBM traffic and
  # int8 KV is inside phase noise. Here cache_extra pads the KV cache to
  # ~4.3k slots (the AR step streams every slot from HBM whether written
  # or masked padding, so this IS the long-context decode cost — without
  # the quadratic-memory long prefill, which OOMs one chip at T~4k):
  # 3.7 GB of bf16 cache next to 5.4 GB of weights, so halving cache
  # bytes is ~1.25x and the full int8 path (int8 weights + int8 KV:
  # 2.8 + 1.9 GB) is ~2x per step.
  if args.xl_t:
    xl = dict(variant="gemma2_2b", img_variant="B/16", res=224,
              batch=8, prefill_len=32, decode_len=384, cache_extra=3688)
    result["gemma2_gqa_xl_t"] = []
    print("building gemma2 T4k (bf16 w, bf16 kv) ...", flush=True)
    run_a, half3, meta_a, params3 = build(**xl)
    print("building gemma2 T4k (bf16 w, int8 kv) ...", flush=True)
    run_b, _, meta_b, _ = build(**xl, cache_dtype="int8",
                                base_params=params3)
    print("building gemma2 T4k (int8 w, int8 kv) ...", flush=True)
    run_c, _, meta_c, _ = build(**xl, quant="int8", cache_dtype="int8",
                                base_params=params3)
    for pair in range(max(args.pairs - 1, 1)):
      a = measure(run_a, xl["decode_len"], half3, args.iters)
      b = measure(run_b, xl["decode_len"], half3, args.iters)
      c = measure(run_c, xl["decode_len"], half3, args.iters)
      row = {"pair": pair, "w16_kv16": a, "w16_kv8": b, "w8_kv8": c}
      if a["ar_step_ms"] and b["ar_step_ms"] and c["ar_step_ms"]:
        row["step_ratio_kv8"] = round(a["ar_step_ms"] / b["ar_step_ms"], 3)
        row["step_ratio_full_int8"] = round(
            a["ar_step_ms"] / c["ar_step_ms"], 3)
      result["gemma2_gqa_xl_t"].append(row)
      print(json.dumps(row), flush=True)
    result["meta_xl_w16_kv16"] = meta_a
    result["meta_xl_w8_kv8"] = meta_c

  # --- Section 4: decode_impl xla vs flash (fused Pallas AR step) ---------
  # Same T~4.3k cache-bound shapes as section 3. The Pallas kernel DMAs the
  # cache plane in its STORAGE dtype (int8 stays 1 byte/element on the
  # HBM->VMEM read) and dequantizes in VMEM; the XLA einsum path reads int8
  # through a convert fusion at ~70% of the bf16 byte rate. Interleaved
  # same-phase pairs, per (cache_dtype, weights) row.
  if args.flash:
    if args.tiny:
      xl = dict(variant="gemma_test", img_variant="mu/16", res=32,
                batch=2, prefill_len=8, decode_len=16, cache_extra=40)
    else:
      xl = dict(variant="gemma2_2b", img_variant="B/16", res=224,
                batch=8, prefill_len=32, decode_len=384, cache_extra=3688)
    result["decode_impl_flash"] = []
    rows = []
    print("building T4k bf16-kv xla vs flash ...", flush=True)
    run_x16, halff, meta_x16, params4 = build(**xl)
    run_f16, _, meta_f16, _ = build(**xl, decode_impl="flash",
                                    base_params=params4)
    rows.append(("kv_bf16", run_x16, run_f16))
    print("building T4k int8-kv xla vs flash ...", flush=True)
    run_x8, _, _, _ = build(**xl, cache_dtype="int8", base_params=params4)
    run_f8, _, _, _ = build(**xl, cache_dtype="int8", decode_impl="flash",
                            base_params=params4)
    rows.append(("kv_int8", run_x8, run_f8))
    print("building T4k full-int8 xla vs flash ...", flush=True)
    run_xq, _, _, _ = build(**xl, quant="int8", cache_dtype="int8",
                            base_params=params4)
    run_fq, _, _, _ = build(**xl, quant="int8", cache_dtype="int8",
                            decode_impl="flash", base_params=params4)
    rows.append(("w8_kv8", run_xq, run_fq))
    for pair in range(max(args.pairs - 1, 1)):
      row = {"pair": pair}
      for name, run_xla, run_flash in rows:
        a = measure(run_xla, xl["decode_len"], halff, args.iters)
        b = measure(run_flash, xl["decode_len"], halff, args.iters)
        row[name] = {"xla": a, "flash": b}
        if a["ar_step_ms"] and b["ar_step_ms"]:
          row[name]["step_ratio_xla_over_flash"] = round(
              a["ar_step_ms"] / b["ar_step_ms"], 3)
      result["decode_impl_flash"].append(row)
      print(json.dumps(row), flush=True)
    result["meta_flash"] = dict(meta_f16, note=(
        "xla rows identical but decode_impl=xla; kv_int8/w8_kv8 rows "
        "identical but cache_dtype/quant per name"))

  with open(args.out, "w") as f:
    json.dump(result, f, indent=1)
  print("wrote", args.out)


if __name__ == "__main__":
  main()
