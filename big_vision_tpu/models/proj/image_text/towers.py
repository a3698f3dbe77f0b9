"""Shared machinery for the contrastive tower models.

Used by two_towers.py (LiT/CLIP/SigLIP) and proj/clippo/one_tower.py: tower
construction by module path, L2-normalized embedding with namespaced aux
outputs, scalar temperature/bias params, and the per-tower checkpoint
loading protocol (including the `ckpt.npz:img` colon syntax).
"""

from __future__ import annotations

import importlib

import jax.numpy as jnp

import big_vision_tpu.utils as u


def build(model_name, cfg, out_dim, name):
  """Instantiates `big_vision_tpu.models.{model_name}`.Model as a tower."""
  module = importlib.import_module(f"big_vision_tpu.models.{model_name}")
  return module.Model(**{"num_classes": out_dim, **(cfg or {})}, name=name)


def embed(tower, x, prefix, **kw):
  """Runs a tower and L2-normalizes; aux lands under `{prefix}/...`."""
  z, aux = tower(x, **kw)
  out = {f"{prefix}/{k}": v for k, v in aux.items()}
  out[f"{prefix}/norm"] = norm = jnp.linalg.norm(z, axis=1, keepdims=True)
  out[f"{prefix}/normalized"] = z = z / (norm + 1e-8)
  return z, out


def scalar(module, name, value):
  """A (1,)-shaped f32 parameter initialized to a constant."""
  return module.param(name, lambda k, s, d: value * jnp.ones(s, d),
                      (1,), jnp.float32)


def pop_any(d, *names):
  """Pops the first present key among `names` (alias support)."""
  for n in names:
    if (v := d.pop(n, None)) is not None:
      return v
  return None


def load_tower(restored, init_files, init_params, model_cfg, *,
               key, aliases, model_field, default_model, cfg_field,
               load_kw=None):
  """Restores one tower sub-checkpoint into `restored[key]` in place."""
  if init := pop_any(init_files, *aliases):
    cfg = dict(model_cfg)
    module = importlib.import_module(
        f"big_vision_tpu.models.{cfg.get(model_field, default_model)}")
    restored[key] = module.load(init_params[key], init,
                                cfg.get(cfg_field, {}), **(load_kw or {}))


def load_scalar(restored, init_files, *, key, aliases):
  """Restores a scalar param (temperature/bias) into `restored[key]`."""
  if init := pop_any(init_files, *aliases):
    restored[key] = u.load_params(init)
