"""Two-tower (LiT / CLIP / SigLIP) contrastive model.

Behavior parity: reference models/proj/image_text/two_towers.py:28-177 —
dynamic img/txt submodels, L2-normalized embeddings, learned
log-temperature `t` and optional logit bias `b`; loader supports per-tower
checkpoints and the `ckpt.npz:img` colon syntax. Param names match.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from big_vision_tpu.models.proj.image_text import towers

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
    zimg = ztxt = None
    out = {}
    dims = self.out_dim
    dims = (dims, dims) if isinstance(dims, int) else dims

    if text is not None:
      txt_tower = towers.build(self.text_model, self.text, dims[1], "txt")
      ztxt, aux = towers.embed(txt_tower, text, "txt", **kw)
      out.update(aux)

    if image is not None:
      img_tower = towers.build(self.image_model, self.image, dims[0],
                               "img")
      zimg, aux = towers.embed(img_tower, image, "img", **kw)
      out.update(aux)

    log_t = towers.scalar(self, "t", jnp.log(self.temperature_init))
    out["t"] = jnp.exp(log_t)
    out["t/parameter"] = log_t
    if self.bias_init is not None:
      out["b"] = towers.scalar(self, "b", self.bias_init)
    return zimg, ztxt, out


def load(init_params, init_files, model_cfg, img_load_kw=None,
         txt_load_kw=None):
  """Loads towers; init_files is a dict with img/txt (or a single path)."""
  if isinstance(init_files, str):
    keys = ("img", "txt", "t") + (
        ("b",) if "bias_init" in dict(model_cfg) else ())
    init_files = {k: f"{init_files}:{k}" for k in keys}
  else:
    init_files = {**init_files}

  restored = {**(init_params or {"img": None, "txt": None})}
  towers.load_tower(restored, init_files, init_params, model_cfg,
                    key="img", aliases=("image", "img"),
                    model_field="image_model", default_model="vit",
                    cfg_field="image", load_kw=img_load_kw)
  towers.load_tower(restored, init_files, init_params, model_cfg,
                    key="txt", aliases=("text", "txt"),
                    model_field="text_model",
                    default_model="proj.image_text.text_transformer",
                    cfg_field="text", load_kw=txt_load_kw)
  towers.load_scalar(restored, init_files, key="t",
                     aliases=("temperature", "t"))
  towers.load_scalar(restored, init_files, key="b", aliases=("bias", "b"))
  assert not init_files, f"Unused model_init entries (typo?): {init_files}"
  return restored
