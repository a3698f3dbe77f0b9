"""CLIPPO: one shared ViT encodes both images and rendered-text images.

Parity target: reference models/proj/clippo/one_tower.py (arxiv/2212.08045).
"""

from __future__ import annotations

import importlib
from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

import big_vision_tpu.utils as u

ConfigDict = Any


class Model(nn.Module):
  image: Optional[ConfigDict] = None
  image_model: str = "vit"
  out_dim: int = 768
  temperature_init: float = 10.0

  @nn.compact
  def __call__(self, image, text=None, **kw):
    """(zimg, ztxt, out); `text` is a rendered-text IMAGE here."""
    ztxt, zimg = None, None
    image_model = importlib.import_module(
        f"big_vision_tpu.models.{self.image_model}"
    ).Model(**{"num_classes": self.out_dim, **(self.image or {})},
            name="img")

    def embed(x, prefix):
      z, out_emb = image_model(x, **kw)
      out = {f"{prefix}/{k}": v for k, v in out_emb.items()}
      out[f"{prefix}/norm"] = jnp.linalg.norm(z, axis=1, keepdims=True)
      out[f"{prefix}/normalized"] = z = z / (out[f"{prefix}/norm"] + 1e-8)
      return z, out

    out = {}
    if image is not None:
      zimg, out_img = embed(image, "img")
      out.update(out_img)
    if text is not None:
      ztxt, out_txt = embed(text, "txt")
      out.update(out_txt)

    temp_init = jnp.log(self.temperature_init)
    t = self.param(
        "t", lambda key, shape, dtype: temp_init * jnp.ones(shape, dtype),
        (1,), jnp.float32)
    out["t"] = jnp.exp(t)
    out["t/parameter"] = t
    return zimg, ztxt, out


def load(init_params, init_files, model_cfg, img_load_kw=None):
  img_load_kw = img_load_kw or {}
  if isinstance(init_files, str):
    init_files = {k: f"{init_files}:{k}" for k in ("img", "t")}
  else:
    init_files = {**init_files}
  restored = {**init_params}
  if img_init := (init_files.pop("image", None)
                  or init_files.pop("img", None)):
    restored["img"] = importlib.import_module(
        "big_vision_tpu.models."
        + dict(model_cfg).get("image_model", "vit")
    ).load(init_params["img"], img_init, dict(model_cfg).get("image", {}),
           **img_load_kw)
  if t_init := (init_files.pop("temperature", None)
                or init_files.pop("t", None)):
    restored["t"] = u.load_params(t_init)
  assert not init_files, f"Unused model_init entries: {init_files}"
  return restored
