"""Attention variants at the ViT-B/16 training shape (BH=3072, T=196, E=64)."""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

B, T, H, E = 256, 196, 12, 64
BH = B * H


def fetch(x):
  return float(jax.device_get(jnp.asarray(x).ravel()[0]))


def timeit(fn, *args, iters=10):
  x = fn(*args)
  fetch(jax.tree.leaves(x)[0])
  t0 = time.perf_counter()
  for _ in range(iters):
    x = fn(*args)
  fetch(jax.tree.leaves(x)[0])
  return (time.perf_counter() - t0) / iters * 1e3


def main():
  n = 8192
  a = jnp.ones((n, n), jnp.bfloat16)
  mm = jax.jit(lambda a: jnp.dot(a, a, preferred_element_type=jnp.bfloat16))
  dt = timeit(mm, a, iters=6)
  peak = 2 * n**3 / (dt / 1e3) / 1e12
  print(f"matmul peak: {peak:.1f} TFLOP/s")

  from big_vision_tpu.ops import flash_attention as fa

  q3, k3, v3 = [jax.random.normal(jax.random.PRNGKey(i), (BH, T, E),
                                  jnp.bfloat16) for i in range(3)]
  gflop_fwd = 2 * 2 * BH * T * T * E / 1e9

  def chain12(call):
    def f(q, k, v):
      x = q
      for _ in range(12):
        x = x + call(x, k, v)
      return jnp.mean(x.astype(jnp.float32))
    return f

  def report(name, call):
    f = chain12(call)
    fwd = timeit(jax.jit(f), q3, k3, v3) / 12
    fb = timeit(jax.jit(jax.grad(f, argnums=(0, 1, 2))), q3, k3, v3) / 12
    print(f"{name:34s} fwd {fwd:6.2f} ms ({gflop_fwd / fwd:6.1f} GF/ms)"
          f"   f+b {fb:6.2f} ms")
    return fwd, fb

  report("oneshot bb=8 (shipped)",
         lambda q, k, v: fa._attend_oneshot(q, k, v, None, None, False))

  for bb in (4, 16, 32):
    old = fa.ONESHOT_BLOCK_B
    fa.ONESHOT_BLOCK_B = bb
    try:
      report(f"oneshot bb={bb} (vmem-capped)",
             lambda q, k, v: fa._attend_oneshot(q, k, v, None, None, False))
    finally:
      fa.ONESHOT_BLOCK_B = old

  for bq, bkv in ((128, 128),):
    report(f"blocked q{bq}/kv{bkv}",
           functools.partial(
               lambda q, k, v, bq=bq, bkv=bkv: fa._attend(
                   q, k, v, None, None, False, bq, bkv)))

  # XLA on flat [BH, T, E].
  import numpy as np
  scale = 1.0 / np.sqrt(E)

  def xla_flat(q, k, v):
    s = jnp.einsum("bqe,bke->bqk", q * scale, k,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bke->bqe", p, v)
  report("xla flat", xla_flat)


if __name__ == "__main__":
  main()
