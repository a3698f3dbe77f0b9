"""ctypes binding for the native data-path library (dataio.cc).

Builds the shared object on first use (g++, links system libjpeg-turbo) and
exposes:

  available() -> bool
  jpeg_size(bytes) -> (h, w)
  decode_crop_resize(bytes, crop=(y0,x0,h,w)|None, out_size=(h,w)|None)
  decode_crop_resize_batch(list[bytes], crops|None, out_size) -> [N,H,W,3]

Falls back cleanly (available() False) if the toolchain or libjpeg is
missing; pp ops then use PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_SRC = os.path.join(os.path.dirname(__file__), "dataio.cc")
_SO = os.path.join(os.path.dirname(__file__), "_dataio.so")


def _build():
  cmd = ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO + ".tmp",
         "-ljpeg", "-pthread"]
  subprocess.run(cmd, check=True, capture_output=True)
  os.replace(_SO + ".tmp", _SO)


def _load():
  global _LIB
  if _LIB is not None:
    return _LIB
  with _LOCK:
    if _LIB is not None:
      return _LIB
    try:
      if (not os.path.exists(_SO)
          or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        _build()
      lib = ctypes.CDLL(_SO)
      lib.bvt_jpeg_size.restype = ctypes.c_int
      lib.bvt_decode_crop_resize.restype = ctypes.c_int
      lib.bvt_decode_crop_resize_batch.restype = ctypes.c_int
      lib.bvt_decode_crop_resize_yuv420.restype = ctypes.c_int
      _LIB = lib
    except (OSError, subprocess.CalledProcessError):
      _LIB = False
  return _LIB


def available() -> bool:
  return bool(_load())


def jpeg_size(data: bytes):
  lib = _load()
  h = ctypes.c_int()
  w = ctypes.c_int()
  rc = lib.bvt_jpeg_size(data, len(data), ctypes.byref(h), ctypes.byref(w))
  if rc:
    raise ValueError("Corrupt JPEG header")
  return h.value, w.value


def decode_crop_resize(data: bytes, crop=None, out_size=None) -> np.ndarray:
  """Decode + optional crop (y0,x0,h,w in original coords) + resize."""
  lib = _load()
  if crop is None and out_size is None:
    h, w = jpeg_size(data)
    out_h, out_w = h, w
    y0 = x0 = 0
    ch = cw = 0
  else:
    y0, x0, ch, cw = crop if crop is not None else (0, 0, 0, 0)
    if out_size is not None:
      out_h, out_w = out_size
    else:
      out_h, out_w = ch, cw
  out = np.empty((out_h, out_w, 3), np.uint8)
  rc = lib.bvt_decode_crop_resize(
      data, len(data), y0, x0, ch, cw, out_h, out_w,
      out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
  if rc:
    raise ValueError("JPEG decode failed")
  return out


def decode_crop_resize_yuv420(data: bytes, crop, out: int):
  """YUV420 fast path: returns (y [out,out], uv [2,out//2,out//2]) uint8.

  Raises ValueError if the JPEG isn't YCbCr 4:2:0/4:4:4 (caller should use
  decode_crop_resize then).
  """
  lib = _load()
  assert out % 2 == 0, out
  y0, x0, ch, cw = crop if crop is not None else (0, 0, 0, 0)
  y_out = np.empty((out, out), np.uint8)
  uv_out = np.empty((2, out // 2, out // 2), np.uint8)
  rc = lib.bvt_decode_crop_resize_yuv420(
      data, len(data), y0, x0, ch, cw, out,
      y_out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
      uv_out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
  if rc == 2:
    raise _NotYuv420()
  if rc:
    raise ValueError("JPEG decode failed")
  return y_out, uv_out


class _NotYuv420(ValueError):
  pass


def decode_crop_resize_batch(datas, crops, out_size, nthreads=None):
  """Threaded batch decode; crops is [N,4] int array or None."""
  lib = _load()
  n = len(datas)
  out_h, out_w = out_size
  out = np.empty((n, out_h, out_w, 3), np.uint8)
  arr_t = ctypes.c_char_p * n
  data_ptrs = arr_t(*datas)
  lens = (ctypes.c_size_t * n)(*[len(d) for d in datas])
  if crops is not None:
    crops = np.ascontiguousarray(crops, np.int32)
    crops_ptr = crops.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
  else:
    crops_ptr = None
  nthreads = nthreads or min(n, os.cpu_count() or 1)
  failures = lib.bvt_decode_crop_resize_batch(
      n, ctypes.cast(data_ptrs, ctypes.POINTER(ctypes.c_char_p)), lens,
      crops_ptr, out_h, out_w,
      out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nthreads)
  if failures:
    raise ValueError(f"{failures}/{n} JPEG decodes failed")
  return out
