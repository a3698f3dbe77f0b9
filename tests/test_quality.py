"""Trained-to-quality guarantees.

Two layers:
  * fast: the committed QUALITY artifact must exist, be self-consistent,
    and show the achieved metric at-or-above the in-config pin (the repo's
    one number it TRAINED TO, mirroring ref configs/vit_s16_i1k.py:18-19's
    pinned-results convention).
  * heavy: actually re-train the recipe (short cosine at reduced steps on
    the real stratified digits split) and require it to clear a
    proportionally reduced bar — proves the recipe still trains, not just
    that an old JSON says so.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "QUALITY_r05.json")


def test_quality_artifact_meets_pin():
    from big_vision_tpu.configs import quality_digits
    with open(ARTIFACT) as f:
        art = json.load(f)
    assert not art["runlocal"], "committed artifact must be the full run"
    assert art["expected"] == quality_digits.EXPECTED, (
        "artifact pin drifted from the in-config expectation")
    for metric, bar in art["expected"].items():
        assert art["achieved"][metric] >= bar, (
            f"{metric}: achieved {art['achieved'][metric]} < pinned {bar}")
    assert art["ok"] is True
    assert art["achieved"]["step"] == art["steps"]


@pytest.mark.heavy
def test_quality_recipe_retrains(tmp_path):
    """600-step re-run must reach >= 0.90 (full 2000-step pin is 0.96)."""
    out = tmp_path / "quality.json"
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("JAX_PLATFORMS", None)  # virtual CPU devices, not the real chip
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_quality.py"),
         "--workdir", str(tmp_path / "wd"),
         "--npz_dir", str(tmp_path / "npz"),
         "--steps", "600", "--bar", "0.90",
         "--out", str(out)],
        check=True, env=env, timeout=3000)
    art = json.loads(out.read_text())
    assert art["ok"], art
