"""NYU depth evaluator (UVIM name; same machinery as the GIVT fork).

Parity target: reference evaluators/proj/uvim/nyu_depth.py (pmap era);
proj/givt/nyu_depth.py is its jit fork and the single implementation here.
"""

from big_vision_tpu.evaluators.proj.givt.nyu_depth import (  # noqa: F401
    Evaluator)

API = "jit"
