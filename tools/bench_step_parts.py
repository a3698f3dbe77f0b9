"""Microbench: where does the ViT-B/16 training step spend its time.

Run from /root/repo (axon plugin needs /root/.axon_site on the path):
    python tools/bench_step_parts.py

Chained dispatch, one jax.device_get sync per timing (the only reliable
barrier on this platform). Reports ms per step component at batch 256
plus the same-session matmul peak so numbers can be read against
platform contention.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

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
  print("device:", jax.devices()[0].device_kind)

  # Session matmul peak for context.
  n = 8192
  a = jnp.ones((n, n), jnp.bfloat16)
  mm = jax.jit(lambda a: jnp.dot(a, a, preferred_element_type=jnp.bfloat16))
  dt = timeit(mm, a, iters=6)
  print(f"matmul peak: {2 * n**3 / (dt / 1e3) / 1e12:.1f} TFLOP/s")

  from big_vision_tpu.models import vit
  import big_vision_tpu.utils as u

  img = jnp.ones((B, 224, 224, 3), jnp.bfloat16)
  labels = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), 1000)

  def build(variant_kw):
    model = vit.Model(num_classes=1000, variant="B/16", posemb="sincos2d",
                      pool_type="gap", dtype_mm="bfloat16", **variant_kw)
    params = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 224, 224, 3)))["params"])(jax.random.PRNGKey(0))
    return model, params

  def train_ms(model, params, with_opt=True):
    tx = optax.adam(1e-3, mu_dtype=jnp.bfloat16)
    opt = jax.jit(tx.init)(params)

    def step(state):
      p, o = state
      def loss_fn(p):
        logits, _ = model.apply({"params": p}, img, train=True)
        return u.softmax_xent(logits=logits, labels=labels)
      l, g = jax.value_and_grad(loss_fn)(p)
      if with_opt:
        upd, o2 = tx.update(g, o, p)
        return (optax.apply_updates(p, upd), o2), l
      return (p, o), l
    step = jax.jit(step, donate_argnums=(0,))
    # donation deletes the inputs; work on copies so callers can reuse params
    state = (jax.tree.map(jnp.copy, params), opt)
    state, l = step(state)
    fetch(l)
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
      state, l = step(state)
    fetch(l)
    return (time.perf_counter() - t0) / iters * 1e3

  model, params = build(dict(attn_impl="flash"))
  full = train_ms(model, params)
  print(f"full step (flash, adam): {full:.1f} ms  "
        f"-> {B / full * 1e3:.0f} img/s")

  no_opt = train_ms(model, params, with_opt=False)
  print(f"fwd+bwd only:            {no_opt:.1f} ms  (opt = {full - no_opt:.1f})")

  model_x, params_x = build(dict(attn_impl="xla"))
  full_x = train_ms(model_x, params_x)
  print(f"full step (xla attn):    {full_x:.1f} ms")

  # Encoder-only (skip stem + head): tokens in, mean-pool loss out.
  tok = jnp.ones((B, T, D), jnp.bfloat16)

  def enc_only(attn_impl):
    enc = vit.Encoder(depth=DEPTH, mlp_dim=MLP, num_heads=H,
                      dtype_mm="bfloat16", attn_impl=attn_impl)
    p = jax.jit(lambda k: enc.init(k, jnp.zeros((1, T, D))))(
        jax.random.PRNGKey(0))

    def f(p):
      out, _ = enc.apply(p, tok)
      return jnp.mean(out.astype(jnp.float32))
    g = jax.jit(jax.value_and_grad(lambda p: f(p)))
    return timeit(g, p)

  print(f"encoder fwd+bwd flash:   {enc_only('flash'):.1f} ms")
  print(f"encoder fwd+bwd xla:     {enc_only('xla'):.1f} ms")

  # Attention core alone (12 layers worth, fwd+bwd).
  from big_vision_tpu.ops import attention as attn_ops
  q = jnp.ones((B, T, H, 64), jnp.bfloat16)

  def attn_stack(impl):
    def f(q):
      x = q
      for _ in range(DEPTH):
        x = attn_ops.dot_product_attention(x, x, x, impl=impl)
      return jnp.mean(x.astype(jnp.float32))
    return jax.jit(jax.grad(f))

  print(f"12x attn core f+b flash: {timeit(attn_stack('flash'), q):.1f} ms")
  print(f"12x attn core f+b xla:   {timeit(attn_stack('xla'), q):.1f} ms")

  # MLP stack alone.
  def mlp_stack():
    blocks = [vit.MlpBlock(mlp_dim=MLP, dtype_mm="bfloat16")
              for _ in range(DEPTH)]
    ps = [jax.jit(lambda k, b=b: b.init(k, jnp.zeros((1, T, D))))(
        jax.random.PRNGKey(i)) for i, b in enumerate(blocks)]

    def f(ps, x):
      for b, p in zip(blocks, ps):
        x = x + b.apply(p, x)
      return jnp.mean(x.astype(jnp.float32))
    return jax.jit(jax.grad(f)), ps

  g, ps = mlp_stack()
  print(f"12x mlp f+b:             {timeit(g, ps, tok):.1f} ms")

  # LayerNorm stack (24 of them, fwd+bwd) — fusion check.
  def ln_stack():
    ln = jax.nn.standardize
    def f(x):
      for _ in range(24):
        x = ln(x, axis=-1)
      return jnp.mean(x.astype(jnp.float32))
    return jax.jit(jax.grad(f))
  print(f"24x layernorm f+b:       {timeit(ln_stack(), tok):.1f} ms")

  # Optimizer alone on B/16-sized params.
  tx = optax.adam(1e-3, mu_dtype=jnp.bfloat16)
  opt = jax.jit(tx.init)(params)
  grads = jax.tree.map(jnp.ones_like, params)

  def opt_step(p, o, g):
    u2, o2 = tx.update(g, o, p)
    return optax.apply_updates(p, u2), o2
  opt_step = jax.jit(opt_step, donate_argnums=(0, 1))
  # donated args: rebuild each iter outside timing not possible; time with
  # fresh copies once per iter is unfair. Use non-donated version.
  opt_step2 = jax.jit(lambda p, o, g: opt_step.__wrapped__(p, o, g))
  print(f"adam update alone:       {timeit(opt_step2, params, opt, grads):.1f} ms")


if __name__ == "__main__":
  main()
