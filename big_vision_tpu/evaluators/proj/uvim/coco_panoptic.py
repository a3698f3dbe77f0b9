"""COCO panoptic evaluator (UVIM name; same machinery as the GIVT fork).

Parity target: reference evaluators/proj/uvim/coco_panoptic.py; see
proj/givt/coco_panoptic.py for the native-PQ implementation notes.
"""

from big_vision_tpu.evaluators.proj.givt.coco_panoptic import (  # noqa: F401
    Evaluator, accumulate_pq_stats)

API = "jit"
