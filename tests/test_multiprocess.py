"""Real multi-PROCESS execution: 2 JAX processes x 4 CPU devices.

Everything else in tests/ runs with process_count == 1; this is the one
place the actual multi-host branches execute (per-process data splits,
cross-process eval merge, chrono broadcast, multi-process checkpoint I/O,
sample-exact resume across a process topology). Mirrors what the reference
relies on pod slices for: big_vision/evaluators/common.py:167-228,
utils.py:1388-1442, train.py:76-77.

Runs real subprocesses with a local coordinator (gloo CPU collectives),
so it is slow (~minutes on the 1-CPU host) — marked slow.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from big_vision_tpu.tools import mp_harness

# spawns 2 real JAX processes x 4 devices (300s+)
pytestmark = pytest.mark.heavy

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SMOKE_ARG = "total_steps=4,batch_size=16,res=32,log=1,ckpt=2"


def run_single_process(workdir):
  """The same config on the usual 1-process 8-device virtual mesh."""
  code = "\n".join([
      "import sys",
      f"sys.path.insert(0, {REPO!r})",
      "import jax",
      "jax.config.update('jax_platforms', 'cpu')",
      "jax.config.update('jax_num_cpu_devices', 8)",
      "from big_vision_tpu import train",
      "from big_vision_tpu.configs import smoke",
      f"c = smoke.get_config({SMOKE_ARG!r})",
      "c.schedule = dict(warmup_steps=1, decay_type='cosine')",
      "c.input.num_threads = 2",
      "c.input.prefetch = 0",
      f"train.main(config=c, workdir={workdir!r})",
  ])
  env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO,
         "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
  r = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                     capture_output=True, text=True, timeout=900)
  assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-4000:])


@pytest.mark.slow
def test_two_process_train_resume_eval_matches_single_process(tmp_path):
  # 2 processes x 4 devices: train, preempt+resume (asserted bit-exact
  # inside worker 0), unequal-length cross-process json merge (asserted in
  # every worker).
  logs = mp_harness.launch(str(tmp_path), nproc=2, devices_per_proc=4,
                           smoke_arg=SMOKE_ARG)
  assert logs.count("MP_WORKER_OK") == 2, logs[-4000:]
  assert "Resuming from" in logs

  with open(tmp_path / "merged.json") as f:
    merged = json.load(f)
  assert sorted((r["pid"], r["i"]) for r in merged) == [
      (0, 0), (0, 1), (1, 0), (1, 1), (1, 2)]

  # Topology invariance: the step-0 classification eval (same seed-0 init,
  # same eval set, before any training) must agree with a 1-process
  # 8-device run — the cross-process process_sum merge may not change the
  # metric. prec@1 is integer-exact; loss is a float sum whose grouping
  # differs across topologies, so allow f32 tolerance.
  wd1 = str(tmp_path / "single")
  run_single_process(wd1)
  with open(tmp_path / "mp_metrics.json") as f:
    rows2 = json.load(f)
  rows1 = mp_harness.read_metrics(wd1)

  def step0_val(rows):
    return [r for r in rows if r["step"] == 0 and "val/prec@1" in r][0]
  v1, v2 = step0_val(rows1), step0_val(rows2)
  assert v1["val/prec@1"] == v2["val/prec@1"], (v1, v2)
  np.testing.assert_allclose(v1["val/loss"], v2["val/loss"], rtol=1e-5)

  # CPU-scored evaluator exactness: the 2-process run (ragged 7/6 example
  # split, both cache levels) must yield the SAME metrics as this process
  # running it single-process on its 8-device mesh — proving the
  # `_mask`/infinite-padding contract and the cross-process
  # sufficient-statistics reduction under process_count > 1.
  import jax
  with open(tmp_path / "mp_eval_exactness.json") as f:
    mp_eval = json.load(f)
  sp_eval = mp_harness.run_eval_exactness(list(jax.devices()))
  for cache in ("none", "final_data"):
    a, b = mp_eval[cache], sp_eval[cache]
    assert a["num"] == b["num"] == 13, (a, b)
    assert a["acc"] == b["acc"], (a, b)
    assert a["acc_any"] == b["acc_any"], (a, b)
    np.testing.assert_allclose(a["anls"], b["anls"], rtol=1e-12)
