"""Save-predictions evaluator (UVIM name; same machinery as the GIVT one).

Parity target: reference evaluators/proj/uvim/save_predictions.py; the
reference later forked a jit-compatible version under proj/givt, which is
the single implementation here.
"""

from big_vision_tpu.evaluators.proj.givt.save_predictions import (  # noqa: F401
    Evaluator)

API = "jit"
