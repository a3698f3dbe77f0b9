"""Alias of big_vision_tpu.pp.autoaugment under the reference's
pp.archive.autoaugment module name (registry side-effect import only)."""

from big_vision_tpu.pp.autoaugment import *  # noqa: F401,F403
