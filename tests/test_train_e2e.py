"""End-to-end trainer test: full CLI run on the smoke config + resume.

Runs in a subprocess (the trainer mutates global jax config: transfer
guard, chrono singleton) on the 8-device CPU mesh.
"""

import json
import os
import subprocess
import sys

import pytest

# full trainer subprocess runs (minutes each)
pytestmark = pytest.mark.heavy

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_train(workdir, config_arg="", extra_env=None):
  env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO,
         **(extra_env or {})}
  cfg = f"big_vision_tpu/configs/smoke.py:{config_arg}" if config_arg else \
      "big_vision_tpu/configs/smoke.py"
  return subprocess.run(
      [sys.executable, "-m", "big_vision_tpu.train",
       "--config", cfg, "--workdir", workdir],
      cwd=REPO, env=env, capture_output=True, text=True, timeout=600)


def read_metrics(workdir):
  rows = []
  with open(os.path.join(workdir, "big_vision_metrics.txt")) as f:
    for line in f:
      rows.append(json.loads(line))
  return rows


@pytest.mark.slow
def test_smoke_train_and_resume(tmp_path):
  wd = str(tmp_path / "wd")
  r = run_train(wd, "total_steps=10,batch_size=16,res=32")
  assert r.returncode == 0, r.stderr[-3000:]
  rows = read_metrics(wd)
  steps = [row["step"] for row in rows]
  assert 10 in steps
  final = [row for row in rows if row["step"] == 10][-1]
  assert "training_loss" in final and "val/prec@1" in final
  assert final["training_loss"] < 3.0
  assert os.path.exists(os.path.join(wd, "ckpt.bv-LAST"))

  # Preemption-safe resume: extend total_steps, must pick up at step 10.
  r2 = run_train(wd, "total_steps=14,batch_size=16,res=32")
  assert r2.returncode == 0, r2.stderr[-3000:]
  assert "Resuming from" in (r2.stderr + r2.stdout)
  steps2 = [row["step"] for row in read_metrics(wd)]
  assert 14 in steps2


@pytest.mark.slow
def test_initial_evals_respect_skip_first(tmp_path):
  """Fresh runs eval at step 0, except skip_first evaluators (reference
  parity: ref trainers run initial-or-final evals, e.g. ref
  trainers/proj/paligemma/train.py:410-418)."""
  wd = str(tmp_path / "wd")
  code = f"""
import sys
sys.path.insert(0, {REPO!r})
import importlib
smoke = importlib.import_module("big_vision_tpu.configs.smoke")
c = smoke.get_config("total_steps=2,batch_size=16,res=32,log=1,ckpt=0")
c.schedule = dict(warmup_steps=1, decay_type="cosine")
val = c.evals["val"].to_dict()
c.evals = dict(val=val, val_skip={{**val, "skip_first": True}})
from big_vision_tpu import train
train.main(config=c, workdir={wd!r})
"""
  env = {**os.environ, "JAX_PLATFORMS": "cpu", "XLA_FLAGS": "",
         "PYTHONPATH": REPO}
  r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                     capture_output=True, text=True, timeout=600)
  assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])
  rows = read_metrics(wd)
  step0 = {k for row in rows if row["step"] == 0 for k in row}
  assert "val/prec@1" in step0, rows
  assert not any(k.startswith("val_skip/") for k in step0), rows
  last = {k for row in rows if row["step"] == 2 for k in row}
  assert "val_skip/prec@1" in last, rows


@pytest.mark.slow
def test_graft_entry_multichip_dryrun(tmp_path):
  """The driver contract: dryrun_multichip must compile+run on 8 devices.

  Mimics the driver's exact call path: NO env help (no JAX_PLATFORMS=cpu,
  no XLA_FLAGS device-count export), and the backend is already initialized
  with too few devices before dryrun_multichip is called — the function must
  self-arrange the 8-device virtual CPU mesh (VERDICT.md round 1, item 1).
  """
  env = {k: v for k, v in os.environ.items()
         if k not in ("JAX_PLATFORMS", "XLA_FLAGS", "JAX_NUM_CPU_DEVICES")}
  env["PYTHONPATH"] = REPO
  code = (
      "import jax\n"
      "n = jax.device_count()\n"  # force backend init, driver-style
      "assert n < 8, f'fixture needs a small backend, got {n}'\n"
      "import __graft_entry__ as g\n"
      "g.dryrun_multichip(8)\n"
      "print('OK')\n")
  r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                     capture_output=True, text=True, timeout=900)
  assert r.returncode == 0, r.stderr[-3000:]
  assert "OK" in r.stdout
  assert "dryrun_multichip(8): OK" in r.stdout


@pytest.mark.slow
def test_eval_only_tool(tmp_path):
  env = {**os.environ, "JAX_PLATFORMS": "cpu", "XLA_FLAGS": "",
         "PYTHONPATH": REPO}
  r = subprocess.run(
      [sys.executable, "-m", "big_vision_tpu.tools.eval_only",
       "--config", "big_vision_tpu/configs/load_and_eval.py:name=smoke",
       "--workdir", str(tmp_path / "wd")],
      cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
  assert r.returncode == 0, r.stderr[-3000:]
  out = r.stderr + r.stdout
  assert "val/prec@1" in out


@pytest.mark.slow
def test_cappa_trainer_e2e(tmp_path):
  env = {**os.environ, "JAX_PLATFORMS": "cpu", "XLA_FLAGS": "",
         "PYTHONPATH": REPO}
  r = subprocess.run(
      [sys.executable, "-m",
       "big_vision_tpu.trainers.proj.cappa.generative",
       "--config", "big_vision_tpu/configs/proj/cappa/smoke.py",
       "--workdir", str(tmp_path / "wd")],
      cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
  assert r.returncode == 0, r.stderr[-3000:]
  metrics = (tmp_path / "wd" / "big_vision_metrics.txt").read_text()
  assert "training_loss" in metrics


def test_bench_decode_tool_tiny(capsys):
  """The serving bench runs end-to-end on the tiny variant and emits the
  JSON contract (value may be null when the AR loop is below timer
  resolution on tiny models)."""
  import json

  from big_vision_tpu.tools import bench_decode

  bench_decode.main([
      "--variant", "gemma_test", "--img_variant", "mu/16", "--res", "32",
      "--batch", "2", "--prefill_len", "4", "--decode_len", "8",
      "--iters", "1"])
  line = capsys.readouterr().out.strip().splitlines()[-1]
  rec = json.loads(line)
  assert rec["metric"] == "paligemma_decode_tok_per_sec"
  for k in ("value", "prefill_ms", "ar_step_ms", "e2e_ms_per_batch",
            "n_params", "implied_weight_stream_gbps",
            "hbm_read_probe_gbps", "device"):
    assert k in rec, k
  assert rec["e2e_ms_per_batch"] > 0


def test_graft_entry_forward():
  """Driver contract: entry() returns a jittable forward + example args."""
  import jax

  import __graft_entry__ as g

  fn, args = g.entry()
  out = jax.jit(fn)(*args)
  assert out.shape == (8, 1000), out.shape


def test_bench_probe_functions():
  """bench.py's probe helpers run on any backend (driver-contract guard:
  a crash in any probe would empty the round's BENCH json)."""
  import bench

  r = bench.measure_host_decode_rate(64, n=8, seconds_cap=2.0)
  assert r > 0
  g = bench.measure_h2d_gbps(mb=1, iters=2)
  assert g > 0
  t = bench.measure_matmul_peak_tflops(n=256, iters=2)
  assert t > 0


@pytest.mark.slow
def test_resume_is_sample_exact(tmp_path):
  """Interrupted-and-resumed training matches uninterrupted training
  bit-exactly: the resume seek replays the input stream (raw position,
  host-pp rng, device-pp rng) and the update rng is step-keyed, so the
  losses after the resume point are identical (beyond the reference,
  which restarts its data stream on resume)."""
  arg = "total_steps=8,batch_size=16,res=32,log=1,ckpt=4"
  wd_a = str(tmp_path / "uninterrupted")
  r = run_train(wd_a, arg)
  assert r.returncode == 0, r.stderr[-3000:]

  wd_b = str(tmp_path / "resumed")
  r = run_train(wd_b, arg + ",stop=4")  # simulated preemption at step 4
  assert r.returncode == 0, r.stderr[-3000:]
  r = run_train(wd_b, arg)
  assert r.returncode == 0, r.stderr[-3000:]
  assert "Seeking input stream to step 4" in (r.stderr + r.stdout)

  def losses(wd):
    return {row["step"]: row["training_loss"] for row in read_metrics(wd)
            if "training_loss" in row}
  la, lb = losses(wd_a), losses(wd_b)
  for step in (5, 6, 7, 8):
    assert la[step] == lb[step], (step, la[step], lb[step])


@pytest.mark.slow
def test_paligemma_resume_is_sample_exact(tmp_path):
  """The PaliGemma trainer shares the sample-exact resume machinery."""
  env = {**os.environ, "JAX_PLATFORMS": "cpu", "XLA_FLAGS": "",
         "PYTHONPATH": REPO}
  cfg = ("big_vision_tpu/configs/proj/paligemma/smoke.py:"
         "total_steps=6,batch_size=16,log=1,ckpt=3")

  def run(workdir, extra=""):
    return subprocess.run(
        [sys.executable, "-m", "big_vision_tpu.trainers.proj.paligemma.train",
         "--config", cfg + extra, "--workdir", workdir],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)

  wd_a, wd_b = str(tmp_path / "a"), str(tmp_path / "b")
  assert run(wd_a).returncode == 0
  assert run(wd_b, ",stop=3").returncode == 0
  r = run(wd_b)
  assert r.returncode == 0, r.stderr[-3000:]
  assert "Seeking input stream to step 3" in (r.stderr + r.stdout)

  def losses(wd):
    return {row["step"]: row["training_loss"] for row in read_metrics(wd)
            if "training_loss" in row}
  la, lb = losses(wd_a), losses(wd_b)
  for step in (4, 5, 6):
    assert la[step] == lb[step], (step, la[step], lb[step])
