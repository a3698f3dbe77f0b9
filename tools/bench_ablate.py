"""Ablation bench: isolate the non-(attn,mlp) encoder overhead."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

B, T, D, H, MLP, DEPTH = 256, 196, 768, 12, 3072, 12


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
  n = 8192
  a = jnp.ones((n, n), jnp.bfloat16)
  mm = jax.jit(lambda a: jnp.dot(a, a, preferred_element_type=jnp.bfloat16))
  dt = timeit(mm, a, iters=6)
  print(f"matmul peak: {2 * n**3 / (dt / 1e3) / 1e12:.1f} TFLOP/s")

  from big_vision_tpu.models import vit
  from big_vision_tpu.ops import attention as attn_ops

  tok = jnp.ones((B, T, D), jnp.bfloat16)

  def enc_time(attn_impl, fwd_only=False, depth=DEPTH):
    enc = vit.Encoder(depth=depth, mlp_dim=MLP, num_heads=H,
                      dtype_mm="bfloat16", attn_impl=attn_impl)
    p = jax.jit(lambda k: enc.init(k, jnp.zeros((1, T, D))))(
        jax.random.PRNGKey(0))

    def f(p):
      out, _ = enc.apply(p, tok)
      return jnp.mean(out.astype(jnp.float32))
    g = jax.jit(f) if fwd_only else jax.jit(jax.value_and_grad(f))
    return timeit(g, p)

  # Identity attention: measures everything except the attention core.
  orig = attn_ops.dot_product_attention
  attn_ops.dot_product_attention = (
      lambda q, k, v, mask=None, impl=None, seg=None: v)
  try:
    no_attn_fb = enc_time("flash")
    no_attn_f = enc_time("flash", fwd_only=True)
  finally:
    attn_ops.dot_product_attention = orig

  print(f"encoder fwd (flash):        {enc_time('flash', fwd_only=True):.1f} ms")
  print(f"encoder fwd+bwd (flash):    {enc_time('flash'):.1f} ms")
  print(f"encoder fwd, attn=identity: {no_attn_f:.1f} ms")
  print(f"encoder f+b, attn=identity: {no_attn_fb:.1f} ms")

  # Projection-only stack: 12x (qkv+out DenseGenerals, no attention math).
  import flax.linen as nn

  class ProjOnly(nn.Module):
    @nn.compact
    def __call__(self, x):
      for i in range(DEPTH):
        y = nn.LayerNorm(dtype=jnp.bfloat16)(x)
        q = nn.DenseGeneral((H, 64), dtype=jnp.bfloat16, name=f"q{i}")(y)
        k = nn.DenseGeneral((H, 64), dtype=jnp.bfloat16, name=f"k{i}")(y)
        v = nn.DenseGeneral((H, 64), dtype=jnp.bfloat16, name=f"v{i}")(y)
        o = nn.DenseGeneral(D, axis=(-2, -1), dtype=jnp.bfloat16,
                            name=f"o{i}")(q + k + v)
        x = x + o
      return x

  m = ProjOnly()
  p = jax.jit(lambda k: m.init(k, jnp.zeros((1, T, D), jnp.bfloat16)))(
      jax.random.PRNGKey(0))
  g = jax.jit(jax.value_and_grad(
      lambda p: jnp.mean(m.apply(p, tok).astype(jnp.float32))))
  print(f"12x proj-only f+b:          {timeit(g, p):.1f} ms")

  # Scan + remat variants of the full encoder.
  for scan, policy in [(True, "nothing_saveable"),
                       (True, "dots_with_no_batch_dims_saveable")]:
    enc = vit.Encoder(depth=DEPTH, mlp_dim=MLP, num_heads=H,
                      dtype_mm="bfloat16", attn_impl="flash", scan=scan,
                      remat_policy=policy)
    p = jax.jit(lambda k: enc.init(k, jnp.zeros((1, T, D))))(
        jax.random.PRNGKey(0))
    g = jax.jit(jax.value_and_grad(
        lambda p: jnp.mean(enc.apply(p, tok)[0].astype(jnp.float32))))
    print(f"encoder f+b scan/{policy[:12]}: {timeit(g, p):.1f} ms")


if __name__ == "__main__":
  main()
