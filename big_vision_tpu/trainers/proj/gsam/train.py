"""GSAM trainer entry point (reference trainers/proj/gsam/train.py).

The full trainer lives in gsam.py alongside the gsam_gradient math; this
module keeps the reference's module path for CLI parity.
"""

from absl import app, flags
import jax
from ml_collections import config_flags

from big_vision_tpu.trainers.proj.gsam.gsam import (  # noqa: F401
    dual_vector, gsam_gradient, main)

if __name__ == "__main__":
  config_flags.DEFINE_config_file("config", None, "Config.",
                                  lock_config=True)
  flags.DEFINE_string("workdir", default=None, help="Work unit directory.")
  jax.config.parse_flags_with_absl()
  flags.mark_flags_as_required(["config"])
  app.run(lambda argv: (main(argv), None)[-1])
