"""CLIPPO: one shared ViT encodes both images and rendered-text images.

Behavior parity: reference models/proj/clippo/one_tower.py
(arxiv/2212.08045). The single tower plays both roles; `text` here is a
rendered-text IMAGE, not token ids. Param names match (img/t).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from big_vision_tpu.models.proj.image_text import towers

ConfigDict = Any


class Model(nn.Module):
  image: Optional[ConfigDict] = None
  image_model: str = "vit"
  out_dim: int = 768
  temperature_init: float = 10.0

  @nn.compact
  def __call__(self, image, text=None, **kw):
    """(zimg, ztxt, out); `text` is a rendered-text IMAGE here."""
    zimg = ztxt = None
    out = {}
    shared = towers.build(self.image_model, self.image, self.out_dim,
                          "img")

    if image is not None:
      zimg, aux = towers.embed(shared, image, "img", **kw)
      out.update(aux)
    if text is not None:
      ztxt, aux = towers.embed(shared, text, "txt", **kw)
      out.update(aux)

    log_t = towers.scalar(self, "t", jnp.log(self.temperature_init))
    out["t"] = jnp.exp(log_t)
    out["t/parameter"] = log_t
    return zimg, ztxt, out


def load(init_params, init_files, model_cfg, img_load_kw=None):
  if isinstance(init_files, str):
    init_files = {k: f"{init_files}:{k}" for k in ("img", "t")}
  else:
    init_files = {**init_files}
  restored = {**init_params}
  towers.load_tower(restored, init_files, init_params, model_cfg,
                    key="img", aliases=("image", "img"),
                    model_field="image_model", default_model="vit",
                    cfg_field="image", load_kw=img_load_kw)
  towers.load_scalar(restored, init_files, key="t",
                     aliases=("temperature", "t"))
  assert not init_files, f"Unused model_init entries: {init_files}"
  return restored
