"""Full-loop dynamics twin: reference big_vision/train.py vs this repo.

Runs the REFERENCE trainer (unmodified, via tools/twin_ref_runner.py) and
big_vision_tpu/train.py side by side on bit-identical init and batches,
then compares the training dynamics step-for-step (training_loss,
l2_grads/params/updates, learning-rate schedule) and writes the artifact
DYNAMICS_r05.json.

Identity guarantees (asserted, not assumed):
  * init — both models produce bit-identical params from the same seed
    (checked here elementwise before the runs).
  * batches — the two input pipelines are fed twin .npz files arranged so
    their streams coincide (this repo's arrays source visits a fixed
    per-epoch permutation; the reference's tf.data source reads the SAME
    file pre-permuted by exactly that permutation). The first K batches of
    both pipelines are dumped and compared bit-exactly.
  * dynamics-relevant rng — dropout 0, no mixup, shuffle(1): the loss
    curve depends only on init+batches (see configs/twin_dynamics.py).

What then differs is exactly what the twin is meant to test: two
independent trainer implementations (update step, optimizer construction,
schedule resolution, input feeding). Residual per-step noise is float32
non-associativity between two different XLA programs.

Usage:
  python tools/dynamics_twin.py --steps 200 --out DYNAMICS_r05.json
"""

import argparse
import json
import os
import subprocess
import sys

import jax
import numpy as np

# Must precede any jax backend init: this environment's sitecustomize
# force-registers the TPU tunnel and overrides JAX_PLATFORMS (see
# tests/conftest.py). The twin runs on CPU for determinism.
jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG = os.path.join(REPO, "big_vision_tpu", "configs", "twin_dynamics.py")

METRICS = ("training_loss", "l2_grads", "l2_params", "l2_updates",
           "global_schedule")


def make_data(steps, batch, seed=7):
  """Learnable 10-class toy set: class prototype + noise, onehot labels."""
  n = steps * batch
  rng = np.random.default_rng(seed)
  protos = rng.normal(0, 1, (10, 32, 32, 3)).astype(np.float32)
  labels = rng.integers(0, 10, n)
  images = (0.5 * protos[labels]
            + rng.normal(0, 1, (n, 32, 32, 3))).astype(np.float32)
  onehot = np.zeros((n, 10), np.float32)
  onehot[np.arange(n), labels] = 1.0
  return {"image": images, "labels": onehot}


def stream_permutation(n, seed=0):
  """The exact example order this repo's pipeline visits in epoch 0.

  Computed by DRIVING the real arrays DataSource + shuffle stage (not by
  re-deriving its rng recipe), so it cannot drift from the implementation.
  """
  sys.path.insert(0, REPO)
  from big_vision_tpu.datasets import arrays
  from big_vision_tpu import input_pipeline as ip
  src = arrays.DataSource(data={"i": np.arange(n, dtype=np.int64)})
  stream = ip._shuffled(src.get_examples(ordered=False, seed=seed, epoch=0),
                        1, np.random.default_rng((seed, 17)))
  return np.array([ex["i"] for ex in stream])


def run_leg(side, npz, steps, batch, workdir, log, reuse=False):
  cfg_arg = f"{CONFIG}:side={side},npz={npz},steps={steps},batch={batch}"
  runner = "twin_ref_runner.py" if side == "ref" else "twin_my_runner.py"
  cmd = [sys.executable, os.path.join(REPO, "tools", runner)]
  cmd += [f"--config={cfg_arg}", f"--workdir={workdir}"]
  # NOTE: do not override JAX_PLATFORMS here — this environment's
  # sitecustomize aborts under it; the runners pin CPU via config.update.
  env = dict(os.environ,
             PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
  os.makedirs(workdir, exist_ok=True)
  if not (reuse and os.path.exists(
      os.path.join(workdir, "big_vision_metrics.txt"))):
    with open(log, "w") as f:
      subprocess.run(cmd, cwd=REPO, env=env, stdout=f, stderr=f, check=True)
  with open(os.path.join(workdir, "big_vision_metrics.txt")) as f:
    rows = [r for r in map(json.loads, f) if "training_loss" in r]
  # The rows are in write order, one per training step, but the step
  # STAMPS cannot be trusted on the reference side: its metric writer
  # flushes asynchronously and reads `self.step` at write time (ref
  # utils.py:1283-1293), so stamps drift by +1 under load, and close()
  # re-flushes the final step's metrics (step_end without a reset),
  # duplicating the last row. Align by position instead — the
  # global_schedule comparison (tolerance 1e-5) then PROVES the
  # positional alignment, since the schedule is an injective function
  # of the step index over the warmup+cosine range.
  if len(rows) >= 2 and rows[-1] == rows[-2]:
    rows = rows[:-1]
  return rows


def dump_batches(side, npz, steps, batch, k, out_npz):
  """Re-exec ourselves to materialize the first k batches of one pipeline."""
  env = dict(os.environ,
             PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
  proc = subprocess.run(
      [sys.executable, os.path.abspath(__file__), "--_dump_side", side,
       "--npz", npz, "--steps", str(steps), "--batch", str(batch),
       "--k", str(k), "--out", out_npz],
      cwd=REPO, env=env, capture_output=True, text=True)
  if proc.returncode != 0:
    sys.stderr.write(proc.stdout[-4000:] + "\n" + proc.stderr[-4000:])
    raise RuntimeError(f"batch dump ({side}) failed: rc={proc.returncode}")
  return dict(np.load(out_npz))


def _dump_main(side, npz, steps, batch, k, out):
  import importlib.util
  spec = importlib.util.spec_from_file_location("twin_cfg", CONFIG)
  cfgmod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(cfgmod)
  config = cfgmod.get_config(f"side={side},npz={npz},steps={steps},"
                             f"batch={batch}")
  batches = {}
  if side == "ref":
    sys.path.insert(0, os.environ.get("BV_REFERENCE", "/root/reference"))
    import importlib.util as iu
    sspec = iu.spec_from_file_location(
        "big_vision.datasets.twin_data",
        os.path.join(REPO, "tools", "twin_ref_source.py"))
    smod = iu.module_from_spec(sspec)
    sspec.loader.exec_module(smod)
    sys.modules["big_vision.datasets.twin_data"] = smod
    import big_vision.input_pipeline as ref_ip
    ds, _ = ref_ip.training(config.input)
    for i, b in zip(range(k), ds):
      for key in ("image", "labels"):
        batches[f"{i}/{key}"] = b[key].numpy()
  else:
    sys.path.insert(0, REPO)
    import jax
    import big_vision_tpu.input_pipeline as my_ip
    it, _ = my_ip.training(config.input, seed=config.seed)
    for i in range(k):
      b = next(it)
      for key in ("image", "labels"):
        batches[f"{i}/{key}"] = np.asarray(jax.device_get(b[key]))
  np.savez(out, **batches)
  # The partially-consumed pipeline leaves live pp/prefetch threads; a
  # normal interpreter exit cancels them mid-C++ ("FATAL: exception not
  # rethrown" -> SIGABRT). The results are on disk; exit hard.
  os._exit(0)


def check_init_parity(width, depth):
  """Both models must produce bit-identical params from the same seed."""
  import jax
  import jax.numpy as jnp
  import jax.tree_util as jtu
  sys.path.insert(0, os.environ.get("BV_REFERENCE", "/root/reference"))
  sys.path.insert(0, REPO)
  import big_vision.models.vit as ref_vit
  import big_vision_tpu.models.vit as my_vit
  kw = dict(num_classes=10, width=width, depth=depth, mlp_dim=4 * width,
            num_heads=4, patch_size=(4, 4), posemb="learn",
            pool_type="gap", rep_size=False)
  rng, rng_init = jax.random.split(jax.random.PRNGKey(0))
  x = jnp.zeros((1, 32, 32, 3), jnp.float32)
  rp = ref_vit.Model(**kw).init(rng_init, x, train=True)["params"]
  mp = my_vit.Model(**kw).init(rng_init, x, train=True)["params"]
  rf = {jtu.keystr(p): v for p, v in jtu.tree_leaves_with_path(rp)}
  mf = {jtu.keystr(p): v for p, v in jtu.tree_leaves_with_path(mp)}
  assert set(rf) == set(mf), "param tree mismatch"
  diffs = {p: float(np.abs(np.asarray(rf[p]) - np.asarray(mf[p])).max())
           for p in rf}
  assert max(diffs.values()) == 0.0, f"init not bit-identical: {diffs}"
  return len(rf)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--steps", type=int, default=200)
  ap.add_argument("--batch", type=int, default=64)
  ap.add_argument("--width", type=int, default=128)
  ap.add_argument("--depth", type=int, default=2)
  ap.add_argument("--k_batches", type=int, default=3)
  ap.add_argument("--workdir", default="/tmp/dynamics_twin")
  ap.add_argument("--out", default=os.path.join(REPO, "DYNAMICS_r05.json"))
  ap.add_argument("--tol_loss_rel", type=float, default=1e-3,
                  help="per-step relative tolerance on training_loss "
                       "(measured r05: max 2.3e-7 over 200 steps)")
  ap.add_argument("--tol_params_rel", type=float, default=1e-3,
                  help="final-step relative tolerance on l2_params "
                       "(measured r05: 6.4e-5)")
  ap.add_argument("--reuse", action="store_true",
                  help="reuse existing leg metrics in --workdir instead of "
                       "re-running the trainers (artifact re-evaluation)")
  # internal re-exec mode for batch dumping
  ap.add_argument("--_dump_side", default=None)
  ap.add_argument("--npz", default=None)
  ap.add_argument("--k", type=int, default=3)
  args, _ = ap.parse_known_args()

  if args._dump_side:
    _dump_main(args._dump_side, args.npz, args.steps, args.batch,
               args.k, args.out)
    return

  os.makedirs(args.workdir, exist_ok=True)

  print(f"[twin] init parity check (width={args.width} depth={args.depth})")
  n_params = check_init_parity(args.width, args.depth)
  print(f"[twin] init bit-identical across {n_params} param arrays")

  data = make_data(args.steps, args.batch)
  n = len(data["image"])
  perm = stream_permutation(n)
  assert sorted(perm) == list(range(n)), "not a permutation"
  npz_my = os.path.join(args.workdir, "data_my.npz")
  npz_ref = os.path.join(args.workdir, "data_ref.npz")
  np.savez(npz_my, **data)
  np.savez(npz_ref, **{k: v[perm] for k, v in data.items()})
  print(f"[twin] wrote {n} examples; ref file pre-permuted to this repo's "
        "epoch-0 visit order")

  print(f"[twin] bit-comparing first {args.k_batches} batches of both "
        "pipelines")
  bref = dump_batches("ref", npz_ref, args.steps, args.batch, args.k_batches,
                      os.path.join(args.workdir, "batches_ref.npz"))
  bmy = dump_batches("my", npz_my, args.steps, args.batch, args.k_batches,
                     os.path.join(args.workdir, "batches_my.npz"))
  assert set(bref) == set(bmy)
  for key in sorted(bref):
    assert bref[key].shape == bmy[key].shape, key
    assert np.array_equal(bref[key], bmy[key]), (
        f"batch stream mismatch at {key}: max diff "
        f"{np.abs(bref[key] - bmy[key]).max()}")
  print("[twin] batch streams bit-identical")

  print("[twin] running REFERENCE trainer leg...")
  ref_rows = run_leg("ref", npz_ref, args.steps, args.batch,
                     os.path.join(args.workdir, "wd_ref"),
                     os.path.join(args.workdir, "ref.log"),
                     reuse=args.reuse)
  print("[twin] running big_vision_tpu trainer leg...")
  my_rows = run_leg("my", npz_my, args.steps, args.batch,
                    os.path.join(args.workdir, "wd_my"),
                    os.path.join(args.workdir, "my.log"),
                    reuse=args.reuse)

  assert len(ref_rows) == len(my_rows) == args.steps, (
      f"expected {args.steps} rows per leg, got ref={len(ref_rows)} "
      f"my={len(my_rows)}")
  steps = list(range(1, args.steps + 1))

  curves, summary = {}, {}
  for m in METRICS:
    r = np.array([row[m] for row in ref_rows])
    o = np.array([row[m] for row in my_rows])
    rel = np.abs(r - o) / np.maximum(1e-12, np.abs(r))
    curves[m] = {"ref": r.round(8).tolist(), "mine": o.round(8).tolist()}
    summary[m] = {
        "max_rel_diff": float(rel.max()),
        "mean_rel_diff": float(rel.mean()),
        "argmax_step": int(steps[int(rel.argmax())]),
        "final_rel_diff": float(rel[-1]),
    }

  loss_rel = np.abs(np.array(curves["training_loss"]["ref"])
                    - np.array(curves["training_loss"]["mine"]))
  loss_rel /= np.maximum(1.0, np.abs(curves["training_loss"]["ref"]))
  ok = (float(loss_rel.max()) <= args.tol_loss_rel
        and summary["l2_params"]["final_rel_diff"] <= args.tol_params_rel
        and summary["global_schedule"]["max_rel_diff"] <= 1e-5)

  first, last = curves["training_loss"]["ref"][0], \
      curves["training_loss"]["ref"][-1]
  artifact = {
      "ok": bool(ok),
      "what": "reference big_vision/train.py vs big_vision_tpu/train.py, "
              "bit-identical init+batches, step-for-step dynamics",
      "config": {"steps": args.steps, "batch": args.batch,
                 "width": args.width, "depth": args.depth,
                 "examples": n, "platform": "cpu-f32"},
      "guarantees": {
          "init_bit_identical": True,
          "first_batches_bit_identical": int(args.k_batches),
          "dropout": 0.0, "mixup": False, "shuffle": "order-preserving",
      },
      "loss_first_step": {"ref": first,
                          "mine": curves["training_loss"]["mine"][0]},
      "loss_last_step": {"ref": last,
                         "mine": curves["training_loss"]["mine"][-1]},
      "loss_decreased": bool(last < 0.5 * first),
      "tolerances": {"loss_rel_per_step": args.tol_loss_rel,
                     "l2_params_final_rel": args.tol_params_rel},
      "summary": summary,
      "curves": curves,
  }
  with open(args.out, "w") as f:
    json.dump(artifact, f, indent=1)
  print(f"[twin] ok={ok}  loss ref {first:.4f}->{last:.4f}  "
        f"max per-step loss rel diff "
        f"{summary['training_loss']['max_rel_diff']:.2e}  "
        f"final l2_params rel diff "
        f"{summary['l2_params']['final_rel_diff']:.2e}")
  print(f"[twin] wrote {args.out}")
  if not ok:
    sys.exit(1)


if __name__ == "__main__":
  main()
