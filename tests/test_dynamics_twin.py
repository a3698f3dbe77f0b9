"""Full-loop dynamics twin as a regression test (short horizon).

Runs tools/dynamics_twin.py end to end — the unmodified REFERENCE trainer
vs big_vision_tpu/train.py on asserted-identical init and batches — for a
reduced step count, and checks the loss curves track step-for-step. The
200-step artifact lives in DYNAMICS_r05.json; this test keeps the harness
(and the parity it proves) from rotting.

Heavy: two full trainer subprocesses on CPU (~3-4 min on a 1-CPU host).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.heavy
@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference checkout not available")
def test_dynamics_twin_short(tmp_path):
  out = tmp_path / "DYNAMICS_test.json"
  proc = subprocess.run(
      [sys.executable, os.path.join(REPO, "tools", "dynamics_twin.py"),
       "--steps", "30", "--batch", "32", "--width", "64", "--depth", "2",
       "--workdir", str(tmp_path / "twin"), "--out", str(out)],
      cwd=REPO, capture_output=True, text=True, timeout=560,
      env={**os.environ, "PYTHONPATH": REPO})
  assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
  art = json.loads(out.read_text())
  assert art["ok"] is True
  assert art["guarantees"]["init_bit_identical"] is True
  assert art["guarantees"]["first_batches_bit_identical"] >= 3
  # The twin run must actually train (loss falls), not just agree on a
  # constant: 30 steps of warmup+cosine on the toy task moves the loss.
  assert art["loss_last_step"]["ref"] < art["loss_first_step"]["ref"]
  assert (art["summary"]["training_loss"]["max_rel_diff"]
          <= art["tolerances"]["loss_rel_per_step"])
