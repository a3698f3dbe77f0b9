"""Mean of per-example metrics (UVIM-era name for the `mean` evaluator).

Parity target: reference evaluators/proj/uvim/compute_mean.py. The core
machinery is identical to evaluators/mean.py in this framework, so this
module re-exports it under the config name the reference uses.
"""

from big_vision_tpu.evaluators.mean import Evaluator  # noqa: F401

API = "jit"
