"""Two-tower (LiT / CLIP / SigLIP) contrastive model.

Parity target: reference models/proj/image_text/two_towers.py:28-177:
dynamic img/txt submodels, L2-normalized embeddings, learned log-temperature
`t` and optional logit bias `b`; loader supports per-tower checkpoints and
the `ckpt.npz:img` colon syntax.
"""

from __future__ import annotations

import importlib
from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

import big_vision_tpu.utils as u

ConfigDict = Any


class Model(nn.Module):
  image: Optional[ConfigDict] = None
  text: Optional[ConfigDict] = None
  text_model: str = "proj.image_text.text_transformer"
  image_model: str = "vit"
  out_dim: Union[int, Tuple[int, int]] = 128
  temperature_init: float = 1.0
  bias_init: Optional[float] = None

  @nn.compact
  def __call__(self, image, text=None, **kw):
    """Returns (zimg [B,C], ztxt [B,C], out); either input may be None."""
    ztxt, zimg = None, None
    out = {}
    out_dims = self.out_dim
    if isinstance(out_dims, int):
      out_dims = (out_dims, out_dims)

    if text is not None:
      text_model = importlib.import_module(
          f"big_vision_tpu.models.{self.text_model}"
      ).Model(**{"num_classes": out_dims[1], **(self.text or {})}, name="txt")
      ztxt, out_txt = text_model(text, **kw)
      for k, v in out_txt.items():
        out[f"txt/{k}"] = v
      out["txt/norm"] = jnp.linalg.norm(ztxt, axis=1, keepdims=True)
      out["txt/normalized"] = ztxt = ztxt / (out["txt/norm"] + 1e-8)

    if image is not None:
      image_model = importlib.import_module(
          f"big_vision_tpu.models.{self.image_model}"
      ).Model(**{"num_classes": out_dims[0], **(self.image or {})},
              name="img")
      zimg, out_img = image_model(image, **kw)
      for k, v in out_img.items():
        out[f"img/{k}"] = v
      out["img/norm"] = jnp.linalg.norm(zimg, axis=1, keepdims=True)
      out["img/normalized"] = zimg = zimg / (out["img/norm"] + 1e-8)

    temp_init = jnp.log(self.temperature_init)
    t = self.param(
        "t", lambda key, shape, dtype: temp_init * jnp.ones(shape, dtype),
        (1,), jnp.float32)
    out["t"] = jnp.exp(t)
    out["t/parameter"] = t
    if (b_init := self.bias_init) is not None:
      out["b"] = self.param(
          "b", lambda k, s, d: b_init * jnp.ones(s, d), (1,), jnp.float32)
    return zimg, ztxt, out


def load(init_params, init_files, model_cfg, img_load_kw=None,
         txt_load_kw=None):
  """Loads towers; init_files is a dict with img/txt (or a single path)."""
  img_load_kw = img_load_kw or {}
  txt_load_kw = txt_load_kw or {}
  if isinstance(init_files, str):
    keys = ("img", "txt", "t", "b") if "bias_init" in dict(model_cfg) else (
        "img", "txt", "t")
    init_files = {k: f"{init_files}:{k}" for k in keys}
  else:
    init_files = {**init_files}

  if not init_params:
    init_params = {"img": None, "txt": None}
  restored = {**init_params}

  if img_init := (init_files.pop("image", None)
                  or init_files.pop("img", None)):
    restored["img"] = importlib.import_module(
        f"big_vision_tpu.models.{dict(model_cfg).get('image_model', 'vit')}"
    ).load(init_params["img"], img_init, dict(model_cfg).get("image", {}),
           **img_load_kw)
  if txt_init := (init_files.pop("text", None)
                  or init_files.pop("txt", None)):
    restored["txt"] = importlib.import_module(
        "big_vision_tpu.models."
        + dict(model_cfg).get("text_model", "proj.image_text.text_transformer")
    ).load(init_params["txt"], txt_init, dict(model_cfg).get("text", {}),
           **txt_load_kw)
  if t_init := (init_files.pop("temperature", None)
                or init_files.pop("t", None)):
    restored["t"] = u.load_params(t_init)
  if b_init := (init_files.pop("bias", None) or init_files.pop("b", None)):
    restored["b"] = u.load_params(b_init)
  assert not init_files, f"Unused model_init entries (typo?): {init_files}"
  return restored
