"""PaliGemma prediction functions (trainer-path module).

Parity target: reference trainers/proj/paligemma/predict_fns.py. The
implementation (jitted prefill + lax.while_loop decode, samplers,
best-of-n) lives next to the model in
models/proj/paligemma/predict_fns.py; this module exposes it under the
path the reference uses and adds the `get_all(model)` convenience.
"""

from __future__ import annotations

from big_vision_tpu.models.proj.paligemma.predict_fns import (  # noqa: F401
    get_sampler, make_predict_fns)


def get_all(model, **kw):
  """All predict fns for the given model ({"logits", "decode", ...})."""
  return make_predict_fns(model, **kw)
