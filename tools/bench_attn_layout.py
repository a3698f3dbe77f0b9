"""Is the BTHD<->BHTD transpose around the flash kernel the missing time?"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

B, T, D, H, E, DEPTH = 256, 196, 768, 12, 64, 12


def fetch(x):
  return float(jax.device_get(jnp.asarray(x).ravel()[0]))


def timeit(fn, *args, iters=8):
  x = fn(*args)
  fetch(jax.tree.leaves(x)[0])
  t0 = time.perf_counter()
  for _ in range(iters):
    x = fn(*args)
  fetch(jax.tree.leaves(x)[0])
  return (time.perf_counter() - t0) / iters * 1e3


def main():
  from big_vision_tpu.ops import attention as attn_ops
  from big_vision_tpu.ops import flash_attention as fa

  qkv = [jax.random.normal(jax.random.PRNGKey(i), (B, T, H, E),
                           jnp.bfloat16) for i in range(3)]

  def stack_bthd(q, k, v):
    x = q
    for i in range(DEPTH):
      # x feeds q so every layer differs: no CSE across layers.
      x = x + attn_ops.dot_product_attention(x, k, v, impl="flash")
    return jnp.mean(x.astype(jnp.float32))

  g = jax.jit(jax.grad(stack_bthd, argnums=(0, 1, 2)))
  print(f"12x attn chained BTHD f+b: {timeit(g, *qkv):.1f} ms")

  def one_fwd(q, k, v):
    return jnp.mean(attn_ops.dot_product_attention(
        q, k, v, impl="flash").astype(jnp.float32))
  print(f"1x attn BTHD fwd:          {timeit(jax.jit(one_fwd), *qkv):.2f} ms")
  g1 = jax.jit(jax.grad(one_fwd, argnums=(0, 1, 2)))
  print(f"1x attn BTHD f+b:          {timeit(g1, *qkv):.2f} ms")

  # Same math, tensors already in [BH, T, E] (what the kernel wants).
  q3, k3, v3 = [x.transpose(0, 2, 1, 3).reshape(B * H, T, E) for x in qkv]

  def stack_flat(q, k, v):
    x = q
    for i in range(DEPTH):
      x = x + fa._attend_oneshot(x, k, v, None, None, False)
    return jnp.mean(x.astype(jnp.float32))

  # What does fa expose? try the custom-vjp entry.
  try:
    g2 = jax.jit(jax.grad(stack_flat, argnums=(0, 1, 2)))
    print(f"12x attn chained BH-TE f+b: {timeit(g2, q3, k3, v3):.1f} ms")
    def one_flat(q, k, v):
      return jnp.mean(fa._attend_oneshot(q, k, v, None, None, False).astype(jnp.float32))
    print(f"1x oneshot flat fwd:       {timeit(jax.jit(one_flat), q3, k3, v3):.2f} ms")
    g3 = jax.jit(jax.grad(one_flat, argnums=(0, 1, 2)))
    print(f"1x oneshot flat f+b:       {timeit(g3, q3, k3, v3):.2f} ms")
  except Exception as e:
    print("flat path:", type(e).__name__, e)


if __name__ == "__main__":
  main()
