"""Subprocess entry point that runs THIS repo's trainer for the twin.

Run as:  python tools/twin_my_runner.py --config <cfg.py:args> --workdir <dir>

Exists (rather than `python -m big_vision_tpu.train`) only to pin the CPU
backend before jax initializes: this environment's sitecustomize force-
registers the TPU tunnel and overrides JAX_PLATFORMS (tests/conftest.py
has the same workaround).
"""

import jax

jax.config.update("jax_platforms", "cpu")

from absl import app, flags  # noqa: E402
from ml_collections import config_flags  # noqa: E402

import big_vision_tpu.train as bv_train  # noqa: E402


def main():
  assert all(d.platform == "cpu" for d in jax.devices()), jax.devices()

  def run_and_exit(argv):
    bv_train.main(argv)
    # The input pipeline's daemon pp/prefetch threads must not be torn
    # down by normal interpreter exit (SIGABRT via pthread cancellation
    # mid-C++); metrics are flushed by main, so exit hard.
    import os
    os._exit(0)

  app.run(run_and_exit)


if __name__ == "__main__":
  config_flags.DEFINE_config_file(
      "config", None, "Training configuration.", lock_config=True)
  flags.DEFINE_string("workdir", default=None, help="Work unit directory.")
  jax.config.parse_flags_with_absl()
  flags.mark_flags_as_required(["config"])
  main()
