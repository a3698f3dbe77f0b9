"""Shared snippets for image-text (LiT / SigLIP) configs.

Parity target: reference configs/proj/image_text/common.py.
"""

import ml_collections


def inits(variant):
  """Known public backbone inits for LiT-style training."""
  return {
      # (txt_name, txt_init, img_name, img_init)
      "B": ("base", "bert_base", "B/16", "howto-i21k-B/16"),
      "L": ("large", "bert_large", "L/16", "howto-i21k-L/16"),
  }[variant]


def merge(**kw):
  return ml_collections.ConfigDict(kw)
