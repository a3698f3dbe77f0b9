"""Subprocess entry point that runs the REFERENCE trainer for the twin.

Run as:  python tools/twin_ref_runner.py --config <cfg.py:args> --workdir <dir>

Puts /root/reference on sys.path, injects tools/twin_ref_source.py into
sys.modules under the name the reference's `bv:` dataset hook will import
(big_vision.datasets.twin_data), then hands control to the reference's own
big_vision/train.py main — the reference code runs unmodified, end to end.
"""

import importlib.util
import os
import sys

REFERENCE = os.environ.get("BV_REFERENCE", "/root/reference")
HERE = os.path.dirname(os.path.abspath(__file__))


def main():
  # This environment's sitecustomize force-registers the TPU-tunnel
  # backend and overrides JAX_PLATFORMS; config.update before any backend
  # init is the only reliable way to pin CPU (see tests/conftest.py).
  import jax
  jax.config.update("jax_platforms", "cpu")

  sys.path.insert(0, REFERENCE)

  spec = importlib.util.spec_from_file_location(
      "big_vision.datasets.twin_data",
      os.path.join(HERE, "twin_ref_source.py"))
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  sys.modules["big_vision.datasets.twin_data"] = mod

  # This jax removed jax.sharding.PositionalSharding, which the reference's
  # u.sync() (utils.py:1161-1165) still uses; a NamedSharding over a flat
  # 1-d device mesh is the drop-in equivalent for that call.
  if not hasattr(jax.sharding, "PositionalSharding"):
    def _positional(devices):
      mesh = jax.sharding.Mesh(list(devices), ("d",))
      return jax.sharding.NamedSharding(mesh,
                                        jax.sharding.PartitionSpec("d"))
    jax.sharding.PositionalSharding = _positional

  from absl import app
  import big_vision.train as ref_train  # noqa: E402 (needs sys.path above)

  import jax
  assert all(d.platform == "cpu" for d in jax.devices()), (
      "twin must run on CPU for determinism; set JAX_PLATFORMS=cpu "
      f"(got {jax.devices()})")

  app.run(ref_train.main)


if __name__ == "__main__":
  main()
