"""Widget-captioning pp ops.

Parity target: reference pp/proj/paligemma/widgetcap.py.
"""

from __future__ import annotations

import numpy as np

from big_vision_tpu.registry import Registry
from big_vision_tpu.pp.utils import PPOp


@Registry.register("preprocess_ops.draw_bbox")
def get_draw_bbox(image_key="image", bbox_key="bbox"):
  """Draws one red bounding box ([y0, x0, y1, x1] in [0,1]) on the image."""

  def _draw_bbox(data):
    data = dict(data)
    image = np.array(data[image_key], np.float32, copy=True)
    h, w = image.shape[:2]
    y0, x0, y1, x1 = np.asarray(data[bbox_key], np.float32).reshape(4)
    # Truncate like TF's draw_bounding_boxes kernel (row = int(y*(h-1))).
    y0, y1 = int(y0 * (h - 1)), int(y1 * (h - 1))
    x0, x1 = int(x0 * (w - 1)), int(x1 * (w - 1))
    y0, y1 = np.clip([y0, y1], 0, h - 1)
    x0, x1 = np.clip([x0, x1], 0, w - 1)
    red = np.asarray([255, 0, 0], np.float32)
    image[y0, x0:x1 + 1] = red
    image[y1, x0:x1 + 1] = red
    image[y0:y1 + 1, x0] = red
    image[y0:y1 + 1, x1] = red
    data[image_key] = image
    return data

  return PPOp(host_fn=_draw_bbox, phase="host", name="draw_bbox")
