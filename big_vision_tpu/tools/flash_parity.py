"""Accuracy-parity evidence for the fused flash-attention default.

Runs on the REAL accelerator (the auto policy routes default ViT training
through the Pallas kernel on perf evidence; this records the accuracy
side). Two parts:

1. Golden-grad suite: for (T, D) in {197, 577, 1056} x {64, 128},
   forward outputs and dq/dk/dv of the kernel vs the XLA reference on
   identical bf16 inputs (f32 accumulation both sides), reporting max
   abs and relative-to-scale errors. Covers one-shot (197/577) and
   blocked (1056) paths, with and without segment masks.

2. Training-curve parity: N steps of ViT-S/16 on deterministic synthetic
   data, flash vs xla attention from identical init — step-0 loss must
   match exactly, later losses within bf16 drift tolerance.

Writes docs/flash_parity.md (+ prints the table). Usage:
  python -m big_vision_tpu.tools.flash_parity [--steps 200] [--out docs/flash_parity.md]
"""

import argparse
import datetime
import io
import os

import jax
import jax.numpy as jnp
import numpy as np


def golden_grads():
  from big_vision_tpu.ops import attention, flash_attention

  rows = []
  for t in (197, 577, 1056):
    for d in (64, 128):
      for seg_mode in ("none", "prefix"):
        b, h = max(1, 2048 // t), 4
        ks = jax.random.split(jax.random.PRNGKey(t * d), 4)
        q, k, v = (jax.random.normal(kk, (b, t, h, d), jnp.bfloat16)
                   for kk in ks[:3])
        seg = None
        if seg_mode == "prefix":
          # Bidirectional prefix (1) then causal tail (2..), some padding.
          pos = np.arange(t)
          s = np.where(pos < t // 3, 1, pos - t // 3 + 2)
          s[-t // 8:] = 0  # padding tail
          seg = jnp.asarray(np.tile(s, (b, 1)), jnp.int32)

        # Padded (seg=0) query rows are don't-care outputs: the kernel
        # zeroes them, xla's expanded-mask softmax leaks mean(V) there.
        # Mask them out of both the loss and the output comparison.
        valid = (jnp.ones((b, t, 1, 1)) if seg is None
                 else (seg > 0).astype(jnp.float32)[:, :, None, None])

        def run(impl):
          def loss(q, k, v):
            o = attention.dot_product_attention(q, k, v, impl=impl,
                                                seg=seg)
            return ((o.astype(jnp.float32) * valid) ** 2).sum()
          g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
          o = jax.jit(lambda q, k, v: attention.dot_product_attention(
              q, k, v, impl=impl, seg=seg) * valid.astype(q.dtype))(
                  q, k, v)
          return jax.device_get((o, *g))

        o1, dq1, dk1, dv1 = run("flash")
        o2, dq2, dk2, dv2 = run("xla")
        def err(a, b):
          a = np.asarray(a, np.float32)
          b = np.asarray(b, np.float32)
          scale = max(np.abs(b).max(), 1e-6)
          return np.abs(a - b).max(), np.abs(a - b).max() / scale
        path = ("one-shot" if flash_attention.oneshot_fits(t, t, d)
                else "blocked")
        rows.append({
            "t": t, "d": d, "seg": seg_mode, "path": path,
            "out": err(o1, o2), "dq": err(dq1, dq2),
            "dk": err(dk1, dk2), "dv": err(dv1, dv2),
        })
        print(f"T={t} D={d} seg={seg_mode} [{path}]: "
              + " ".join(f"{k}={rows[-1][k][1]:.2e}"
                         for k in ("out", "dq", "dk", "dv")), flush=True)
  return rows


def train_curves(steps, batch=64):
  import optax
  import big_vision_tpu.utils as u
  from big_vision_tpu.models import vit

  # Learnable task: each class is a fixed random template plus noise, so
  # the loss must actually FALL (round-2's random labels only evidenced
  # drift, not learning dynamics: losses sat at ln(100) for 200 steps).
  n_classes = 16
  templates = jax.random.normal(
      jax.random.PRNGKey(42), (n_classes, 224, 224, 3)) * 0.6

  losses = {}
  for impl in ("flash", "xla"):
    model = vit.Model(num_classes=n_classes, variant="S/16",
                      posemb="sincos2d", pool_type="gap",
                      dtype_mm="bfloat16", attn_impl=impl)
    params = jax.jit(lambda k: model.init(
        k, jnp.zeros((1, 224, 224, 3)))["params"])(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    opt = jax.jit(tx.init)(params)

    @jax.jit
    def step(state, rng):
      params, opt = state
      rng, r1, r2 = jax.random.split(rng, 3)
      lab_idx = jax.random.randint(r2, (batch,), 0, n_classes)
      img = (templates[lab_idx]
             + 0.7 * jax.random.normal(r1, (batch, 224, 224, 3)))
      lab = jax.nn.one_hot(lab_idx, n_classes)
      def loss_fn(p):
        logits, _ = model.apply({"params": p}, img, train=True)
        return u.softmax_xent(logits=logits, labels=lab)
      loss, grads = jax.value_and_grad(loss_fn)(params)
      upd, opt = tx.update(grads, opt, params)
      return (optax.apply_updates(params, upd), opt), rng, loss

    state, rng = (params, opt), jax.random.PRNGKey(7)
    curve = []
    for i in range(steps):
      state, rng, loss = step(state, rng)
      if i % max(1, steps // 20) == 0 or i == steps - 1:
        curve.append((i, float(jax.device_get(loss))))
    losses[impl] = curve
    print(f"{impl}: step0 {curve[0][1]:.6f} ... final {curve[-1][1]:.6f}",
          flush=True)
  return losses


def main(argv=None):
  p = argparse.ArgumentParser()
  p.add_argument("--steps", type=int, default=200)
  p.add_argument("--out", default="docs/flash_parity.md")
  args = p.parse_args(argv)

  dev = jax.devices()[0].device_kind
  rows = golden_grads()
  curves = train_curves(args.steps)

  buf = io.StringIO()
  buf.write("# Flash-attention parity evidence\n\n")
  buf.write(f"Device: {dev}; date: {datetime.date.today()}; "
            f"jax {jax.__version__}.\n\n")
  buf.write("## Golden-grad suite (bf16 inputs, f32 reference via XLA)\n\n")
  buf.write("Relative-to-scale max errors (|flash - xla|_inf / |xla|_inf):"
            "\n\n| T | D | seg | path | out | dq | dk | dv |\n"
            "|---|---|---|---|---|---|---|---|\n")
  worst = 0.0
  n_entries = n_over = 0
  bf16_res = 7.8e-3
  for r in rows:
    for k in ("out", "dq", "dk", "dv"):
      n_entries += 1
      n_over += r[k][1] > bf16_res
      worst = max(worst, r[k][1])
    buf.write(f"| {r['t']} | {r['d']} | {r['seg']} | {r['path']} | "
              + " | ".join(f"{r[k][1]:.2e}" for k in
                           ("out", "dq", "dk", "dv")) + " |\n")
  buf.write(
      f"\n{n_entries - n_over} of {n_entries} entries are at or below "
      f"bf16 resolution (~{bf16_res:.1e}); {n_over} exceed it, worst "
      f"{worst:.2e} (~{worst / bf16_res:.1f}x resolution — accumulated "
      "rounding over the longest reduction chains).\n")
  buf.write(f"\n## Training-curve parity (ViT-S/16, {args.steps} steps,"
            " identical init/data)\n\n| step | flash loss | xla loss |\n"
            "|---|---|---|\n")
  for (i, lf), (_, lx) in zip(curves["flash"], curves["xla"]):
    buf.write(f"| {i} | {lf:.6f} | {lx:.6f} |\n")
  d0 = abs(curves["flash"][0][1] - curves["xla"][0][1])
  buf.write(f"\nStep-0 |delta| = {d0:.2e}.\n")

  os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
  with open(args.out, "w") as f:
    f.write(buf.getvalue())
  print(f"wrote {args.out}")


if __name__ == "__main__":
  main()
