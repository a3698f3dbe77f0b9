"""Core utilities, re-exported flat so callers can do `import ... utils as u`.

Capability map to the reference's monolithic `big_vision/utils.py` — here it is
split into focused modules:
  trees.py      — name-addressed pytree ops (ref utils.py:615-826)
  losses.py     — xent/contrastive losses (ref utils.py:236-326)
  schedules.py  — durations + LR schedules (ref utils.py:1002-1143)
  mesh.py       — device mesh + resharding + global-array feed
                  (ref utils.py:1317-1478)
  chrono.py     — step/time accounting (ref utils.py:411-591)
  writers.py    — JSONL metric writer (ref utils.py:1242-1299)
  checkpoints.py— async sharded ckpt with -LAST pointer (ref utils.py:865-999)
"""

# pylint: disable=wildcard-import
from big_vision_tpu.utils.trees import *  # noqa: F401,F403
from big_vision_tpu.utils.losses import *  # noqa: F401,F403
from big_vision_tpu.utils.schedules import *  # noqa: F401,F403
from big_vision_tpu.utils.mesh import *  # noqa: F401,F403
from big_vision_tpu.utils.chrono import *  # noqa: F401,F403
from big_vision_tpu.utils.writers import *  # noqa: F401,F403
from big_vision_tpu.utils.checkpoints import *  # noqa: F401,F403
from big_vision_tpu.utils.profiling import *  # noqa: F401,F403
