"""Experimental FlexiViT model name used by the timing config.

Snapshot gap: the reference's configs/proj/flexivit/timing.py sets
``model_name = 'xp.flexivit.vit'`` but the ``models/xp`` package is absent
from the public big_vision snapshot. The public FlexiViT model
(models/proj/flexi/vit.py here, ref models/proj/flexi/vit.py) implements
the same PI-resized patch embedding, so this module delegates to it and
only normalizes the config surface the timing config uses (tuple-valued
``seqhw``).
"""

from __future__ import annotations

from big_vision_tpu.models.proj.flexi import vit as flexi_vit


def _square(v, name):
  if isinstance(v, (tuple, list)):
    assert len(set(v)) == 1, f"{name} must be square, got {v}"
    return v[0]
  return v


def Model(num_classes, *, seqhw=None, **kw):  # pylint: disable=invalid-name
  if seqhw is not None:
    seqhw = _square(seqhw, "seqhw")
  return flexi_vit.Model(num_classes, seqhw=seqhw, **kw)


load = flexi_vit.load
