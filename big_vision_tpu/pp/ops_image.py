"""Image preprocessing ops.

Parity targets: reference big_vision/pp/ops_image.py (cited per op).

Phase placement (see pp/utils.py):
  * decode / decode_jpeg_and_inception_crop / inception_crop / resize_small /
    resize_long — host (variable shapes, PIL/numpy).
  * resize / random_crop / central_crop — dual; staticizers when sized.
  * flip_lr / value-range variants / convert_to_video — device (jax, vmapped).
"""

from __future__ import annotations

import io

import jax
import jax.numpy as jnp
import numpy as np

from big_vision_tpu.registry import Registry
from big_vision_tpu.pp.utils import InKeyOutKey, PPOp, as_pp_op, maybe_repeat

# TF resize method name -> (jax.image.resize method, PIL filter name).
_METHODS = {
    "bilinear": ("linear", "BILINEAR"),
    "bicubic": ("cubic", "BICUBIC"),
    "nearest": ("nearest", "NEAREST"),
    "lanczos3": ("lanczos3", "LANCZOS"),
    "lanczos5": ("lanczos5", "LANCZOS"),
    "area": ("area", "BOX"),  # own exact impl (_area_resize); see below
}


def _area_window(isize, osize):
  """Fractional-coverage box-filter window for one axis.

  TF's `tf.image.resize(method="area")` averages input pixels with their
  exact fractional coverage of each corner-anchored output cell
  [i*scale, (i+1)*scale) (verified vs a direct coverage computation: max
  delta 2e-3 on a 137->77 uint8 resize, where PIL's BOX filter is off by up
  to 131). Returns (idx [o, k], w [o, k]) such that
  out[i] = sum_k w[i, k] * in[idx[i, k]].
  """
  scale = isize / osize
  kmax = int(np.ceil(scale)) + 1
  i = np.arange(osize)
  a, b = i * scale, (i + 1) * scale
  ks = np.floor(a).astype(np.int64)[:, None] + np.arange(kmax)[None, :]
  w = np.minimum(ks + 1.0, b[:, None]) - np.maximum(ks, a[:, None])
  w = np.clip(w, 0.0, None).astype(np.float32)
  w /= w.sum(1, keepdims=True)
  return np.clip(ks, 0, isize - 1), w


def _area_resize(image, size, xp):
  """Exact area resize over the first two axes; xp is np or jnp."""
  out = xp.asarray(image, xp.float32)
  for axis, osize in enumerate(size):
    idx, w = _area_window(image.shape[axis], osize)
    moved = xp.moveaxis(out, axis, 0)
    # [o, k, ...rest] gather, then contract the window axis.
    out = xp.moveaxis(xp.einsum("ok,ok...->o...", w, moved[idx]), 0, axis)
  return out


def _clip_cast(img_f32, ref_dtype):
  """TF-resize semantics: compute float, clip to dtype range, cast back."""
  if np.issubdtype(ref_dtype, np.integer):
    info = np.iinfo(ref_dtype)
    img_f32 = jnp.clip(img_f32, info.min, info.max) if isinstance(
        img_f32, jnp.ndarray) else np.clip(img_f32, info.min, info.max)
  return img_f32.astype(ref_dtype)


def _jax_resize(image, size, method, antialias):
  jax_method, _ = _METHODS[method]
  dtype = image.dtype
  if method == "area":
    out = _area_resize(image, size, jnp)
  else:
    out = jax.image.resize(
        jnp.asarray(image, jnp.float32), (*size, image.shape[-1]),
        method=jax_method, antialias=antialias)
  return _clip_cast(out, dtype)


def _pil_resize(image, size, method, antialias):
  """Host resize via PIL; handles uint8 HWC images of any channel count.

  "area" bypasses PIL: PIL's BOX filter does not reproduce TF's
  fractional-coverage average (see _area_window); the exact numpy windowed
  sum does, at ~1 ms for a 500px image.
  """
  from PIL import Image
  image = np.asarray(image)
  dtype = image.dtype
  if method == "area":
    return _clip_cast(_area_resize(image, size, np), dtype)
  if dtype != np.uint8:
    # PIL float support is single-channel only; go through jax eagerly
    # (the only path where `antialias` is honored — PIL's own filters
    # are inherently antialiased where applicable).
    return np.asarray(_jax_resize(image, size, method, antialias=antialias))
  _, pil_name = _METHODS[method]
  pil_filter = getattr(Image.Resampling, pil_name)
  h, w = size
  if image.shape[-1] == 3:  # fast path: one RGB resize
    return np.asarray(
        Image.fromarray(image).resize((w, h), pil_filter), dtype)
  chans = [
      np.asarray(Image.fromarray(image[..., c]).resize((w, h), pil_filter))
      for c in range(image.shape[-1])
  ]
  return np.stack(chans, axis=-1).astype(dtype)


def _is_jpeg(b):
  return isinstance(b, bytes) and b[:3] == b"\xff\xd8\xff"


@Registry.register("preprocess_ops.decode")
def get_decode(channels=3, precise=False, key="image", inkey=None,
               outkey=None):
  """Decodes JPEG/PNG bytes to uint8 HWC (host). Ref ops_image.py:31.

  JPEGs go through the native libjpeg-turbo path (GIL-free, bit-exact with
  PIL); other formats and channel counts fall back to PIL.
  """
  del precise  # Both paths use the INTEGER_ACCURATE-style IDCT.
  from PIL import Image
  from big_vision_tpu import native
  ik, ok = inkey or key, outkey or key

  def _decode(data):
    raw = data[ik]
    if channels == 3 and _is_jpeg(raw) and native.available():
      arr = native.decode_crop_resize(raw)
    else:
      img = Image.open(io.BytesIO(raw))
      img = img.convert({1: "L", 3: "RGB", 4: "RGBA"}[channels])
      arr = np.asarray(img, np.uint8)
      if arr.ndim == 2:
        arr = arr[:, :, None]
    data = dict(data)
    data[ok] = arr
    return data

  return PPOp(host_fn=_decode, phase="host", name="decode")


@Registry.register("preprocess_ops.resize")
def get_resize(size, method="bilinear", antialias=False, key="image",
               inkey=None, outkey=None):
  """Resizes to [H, W]; dual impl; staticizer. Ref :57."""
  size = maybe_repeat(size, 2)
  ik, ok = inkey or key, outkey or key

  def _dev(data):
    data = dict(data)
    data[ok] = _jax_resize(data[ik], size, method, antialias)
    return data

  def _host(data):
    data = dict(data)
    data[ok] = _pil_resize(data[ik], size, method, antialias)
    return data

  return PPOp(fn=_dev, host_fn=_host, staticizer=True, name="resize")


def _host_resize_factor(image, factor, method, antialias):
  h, w = image.shape[0], image.shape[1]
  nh, nw = int(round(h * factor)), int(round(w * factor))
  return _pil_resize(image, (nh, nw), method, antialias)


@Registry.register("preprocess_ops.resize_small")
def get_resize_small(smaller_size, method="area", antialias=False, key="image",
                     inkey=None, outkey=None):
  """Resizes the smaller side, keeping aspect (host). Ref :106."""
  ik, ok = inkey or key, outkey or key

  def _op(data):
    img = np.asarray(data[ik])
    factor = smaller_size / min(img.shape[0], img.shape[1])
    data = dict(data)
    data[ok] = _host_resize_factor(img, factor, method, antialias)
    return data

  return PPOp(host_fn=_op, phase="host", name="resize_small")


@Registry.register("preprocess_ops.resize_long")
def get_resize_long(longer_size, method="area", antialias=True, key="image",
                    inkey=None, outkey=None):
  """Resizes the longer side, keeping aspect (host). Ref :134."""
  ik, ok = inkey or key, outkey or key

  def _op(data):
    img = np.asarray(data[ik])
    factor = longer_size / max(img.shape[0], img.shape[1])
    data = dict(data)
    data[ok] = _host_resize_factor(img, factor, method, antialias)
    return data

  return PPOp(host_fn=_op, phase="host", name="resize_long")


def _sample_inception_box(np_rng, h, w, area_min, area_max, ratio_min,
                          ratio_max, max_tries=100):
  """Samples a crop box with area/aspect in range (host RNG).

  Reproduces tf.image.sample_distorted_bounding_box's GenerateRandomCrop
  (min_object_covered=0): per attempt, sample the aspect ratio uniformly,
  derive the [min,max] crop height from the area range, sample the height
  UNIFORMLY in that interval (not uniform in area — the distributions
  differ, and the published numbers trained on this one), round the width
  from the aspect, and nudge ±1 row to stay inside the area bounds.
  Position is uniform. Falls back to the full image after `max_tries`
  (TF default 100). Validated distributionally against the TF op in
  tests/test_reference_parity.py.
  """
  min_area = area_min * h * w
  max_area = area_max * h * w
  for _ in range(max_tries):
    aspect = np_rng.uniform(ratio_min, ratio_max)
    ch = int(round(np.sqrt(min_area / aspect)))
    max_h = int(round(np.sqrt(max_area / aspect)))
    if round(max_h * aspect) > w:
      # Largest height whose rounded width still fits.
      max_h = int((w + 0.5 - 1e-7) / aspect)
    max_h = min(max_h, h)
    if ch >= max_h:
      ch = max_h
    else:
      ch += int(np_rng.integers(0, max_h - ch + 1))
    cw = int(round(ch * aspect))
    area = cw * ch
    if area < min_area:
      ch += 1
      cw = int(round(ch * aspect))
      area = cw * ch
    if area > max_area:
      ch -= 1
      cw = int(round(ch * aspect))
      area = cw * ch
    if (area < min_area or area > max_area or cw > w or ch > h
        or cw <= 0 or ch <= 0):
      continue
    y0 = int(np_rng.integers(0, h - ch + 1)) if ch < h else 0
    x0 = int(np_rng.integers(0, w - cw + 1)) if cw < w else 0
    return y0, x0, ch, cw
  return 0, 0, h, w


@Registry.register("preprocess_ops.inception_crop")
def get_inception_crop(size=None, area_min=5, area_max=100, method="bilinear",
                       antialias=False, key="image", inkey=None, outkey=None):
  """Random area+aspect crop (host), optional resize. Ref :158."""
  ik, ok = inkey or key, outkey or key

  def _op(data, np_rng):
    img = np.asarray(data[ik])
    y0, x0, ch, cw = _sample_inception_box(
        np_rng, img.shape[0], img.shape[1],
        area_min / 100, area_max / 100, 3. / 4, 4. / 3)
    crop = img[y0:y0 + ch, x0:x0 + cw]
    if size:
      crop = _pil_resize(crop, maybe_repeat(size, 2), method, antialias)
    data = dict(data)
    data[ok] = crop
    return data

  return PPOp(host_fn=_op, phase="host", random=True,
              staticizer=bool(size), name="inception_crop")


@Registry.register("preprocess_ops.decode_jpeg_and_inception_crop")
def get_decode_jpeg_and_inception_crop(
    size=None, area_min=5, area_max=100, ratio_min=0.75, ratio_max=1.33,
    method="bilinear", antialias=False, key="image", inkey=None, outkey=None):
  """Fused decode + inception crop (host). Ref :197.

  Uses the native libjpeg-turbo crop-window decode (+ fused IDCT downscale
  and bilinear resize, big_vision_tpu/native/dataio.cc) so discarded pixels
  are never decoded; falls back to PIL when the native lib is unavailable
  or the input isn't JPEG.
  """
  from PIL import Image
  from big_vision_tpu import native
  ik, ok = inkey or key, outkey or key
  use_native_resize = size and method == "bilinear" and not antialias

  def _op(data, np_rng):
    raw = data[ik]
    if _is_jpeg(raw) and native.available():
      h, w = native.jpeg_size(raw)
      y0, x0, ch, cw = _sample_inception_box(
          np_rng, h, w, area_min / 100, area_max / 100, ratio_min, ratio_max)
      out_size = maybe_repeat(size, 2) if use_native_resize else None
      crop = native.decode_crop_resize(raw, crop=(y0, x0, ch, cw),
                                       out_size=out_size)
      if size and not use_native_resize:
        crop = _pil_resize(crop, maybe_repeat(size, 2), method, antialias)
    else:
      img = Image.open(io.BytesIO(raw))
      w, h = img.size  # PIL reads the header only at this point.
      y0, x0, ch, cw = _sample_inception_box(
          np_rng, h, w, area_min / 100, area_max / 100, ratio_min, ratio_max)
      img = img.convert("RGB").crop((x0, y0, x0 + cw, y0 + ch))
      crop = np.asarray(img, np.uint8)
      if size:
        crop = _pil_resize(crop, maybe_repeat(size, 2), method, antialias)
    data = dict(data)
    data[ok] = crop
    return data

  return PPOp(host_fn=_op, phase="host", random=True,
              staticizer=bool(size), name="decode_jpeg_and_inception_crop")


@Registry.register("preprocess_ops.decode_jpeg_and_inception_crop_yuv")
def get_decode_jpeg_and_inception_crop_yuv(
    size, area_min=5, area_max=100, ratio_min=0.75, ratio_max=1.33,
    key="image", inkey=None, outkey=None):
  """YUV420 fast-path variant of decode_jpeg_and_inception_crop.

  Decodes only the JPEG's raw YCbCr planes (skipping libjpeg's chroma
  upsampling + RGB conversion), crops+resizes them on host, and emits
  `{out}_y` [S,S] + `{out}_uv` [2,S/2,S/2] uint8. Pair with the
  `yuv420_to_rgb` device op, which reconstitutes RGB on the accelerator:
  half the host->HBM bytes and ~35% less host decode work. Pixels differ
  slightly from the RGB path (chroma resampled at 1/2 res - the same
  information the JPEG actually stores).
  """
  from big_vision_tpu import native
  ik = inkey or key
  ok = outkey or key
  assert size % 2 == 0, size

  def _op(data, np_rng):
    raw = data[ik]
    h, w = native.jpeg_size(raw)
    y0, x0, ch, cw = _sample_inception_box(
        np_rng, h, w, area_min / 100, area_max / 100, ratio_min, ratio_max)
    data = dict(data)
    try:
      y, uv = native.decode_crop_resize_yuv420(raw, (y0, x0, ch, cw), size)
      data.pop(ik, None)
      data[f"{ok}_y"], data[f"{ok}_uv"] = y, uv
    except ValueError:  # not a 420/444 YCbCr jpeg: plain RGB fallback
      rgb = native.decode_crop_resize(raw, crop=(y0, x0, ch, cw),
                                      out_size=(size, size))
      data.pop(ik, None)
      data[f"{ok}_y"] = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
                         + 0.114 * rgb[..., 2]).astype(np.uint8)
      small = rgb[::2, ::2].astype(np.float32)
      cb = 128 + (small[..., 2] - (0.299 * small[..., 0]
                                   + 0.587 * small[..., 1]
                                   + 0.114 * small[..., 2])) * 0.564
      cr = 128 + (small[..., 0] - (0.299 * small[..., 0]
                                   + 0.587 * small[..., 1]
                                   + 0.114 * small[..., 2])) * 0.713
      data[f"{ok}_uv"] = np.stack(
          [np.clip(cb, 0, 255), np.clip(cr, 0, 255)]).astype(np.uint8)
    return data

  return PPOp(host_fn=_op, phase="host", random=True, staticizer=True,
              name="decode_jpeg_and_inception_crop_yuv")


@Registry.register("preprocess_ops.yuv420_to_rgb")
def get_yuv420_to_rgb(key="image"):
  """Device op: {key}_y + {key}_uv -> {key} RGB float32 in [0, 255].

  BT.601 full-range YCbCr (what JPEG stores); chroma upsampled 2x bilinear.
  """
  def _op(data):
    data = dict(data)
    y = jnp.asarray(data.pop(f"{key}_y"), jnp.float32)
    uv = jnp.asarray(data.pop(f"{key}_uv"), jnp.float32)
    s = y.shape[0]
    up = jax.image.resize(uv, (2, s, s), method="linear")
    cb, cr = up[0] - 128.0, up[1] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    data[key] = jnp.clip(jnp.stack([r, g, b], -1), 0.0, 255.0)
    return data

  return PPOp(fn=_op, name="yuv420_to_rgb")


@Registry.register("preprocess_ops.random_crop")
def get_random_crop(crop_size, key="image", inkey=None, outkey=None):
  """Random fixed-size crop; dual impl; staticizer. Ref :245."""
  ch, cw = maybe_repeat(crop_size, 2)
  ik, ok = inkey or key, outkey or key

  def _dev(data, rng):
    img = jnp.asarray(data[ik])
    ky, kx = jax.random.split(rng)
    y0 = jax.random.randint(ky, (), 0, img.shape[0] - ch + 1)
    x0 = jax.random.randint(kx, (), 0, img.shape[1] - cw + 1)
    crop = jax.lax.dynamic_slice(
        img, (y0, x0, 0), (ch, cw, img.shape[-1]))
    data = dict(data)
    data[ok] = crop
    return data

  def _host(data, np_rng):
    img = np.asarray(data[ik])
    y0 = int(np_rng.integers(0, img.shape[0] - ch + 1))
    x0 = int(np_rng.integers(0, img.shape[1] - cw + 1))
    data = dict(data)
    data[ok] = img[y0:y0 + ch, x0:x0 + cw]
    return data

  return PPOp(fn=_dev, host_fn=_host, random=True, staticizer=True,
              name="random_crop")


@Registry.register("preprocess_ops.central_crop")
def get_central_crop(crop_size=None, key="image", inkey=None, outkey=None):
  """Center crop; dual when sized; largest-square variant is host. Ref :266."""
  ik, ok = inkey or key, outkey or key
  if crop_size:
    ch, cw = maybe_repeat(crop_size, 2)

    def _dev(data):
      img = jnp.asarray(data[ik])
      dy = (img.shape[0] - ch) // 2
      dx = (img.shape[1] - cw) // 2
      data = dict(data)
      data[ok] = jax.lax.dynamic_slice(img, (dy, dx, 0),
                                       (ch, cw, img.shape[-1]))
      return data

    def _host(data):
      img = np.asarray(data[ik])
      dy = (img.shape[0] - ch) // 2
      dx = (img.shape[1] - cw) // 2
      data = dict(data)
      data[ok] = img[dy:dy + ch, dx:dx + cw]
      return data

    return PPOp(fn=_dev, host_fn=_host, staticizer=True, name="central_crop")

  def _host_sq(data):
    img = np.asarray(data[ik])
    s = min(img.shape[0], img.shape[1])
    dy = (img.shape[0] - s) // 2
    dx = (img.shape[1] - s) // 2
    data = dict(data)
    data[ok] = img[dy:dy + s, dx:dx + s]
    return data

  return PPOp(host_fn=_host_sq, phase="host", name="central_crop")


@Registry.register("preprocess_ops.flip_lr")
@as_pp_op(random=True)
@InKeyOutKey(random=True)
def get_random_flip_lr():
  """50% horizontal flip (device). Ref :295."""
  def _flip(image, rng):
    image = jnp.asarray(image)
    flip = jax.random.bernoulli(rng)
    return jnp.where(flip, image[:, ::-1, :], image)
  return _flip


@Registry.register("preprocess_ops.vgg_value_range")
@as_pp_op()
@InKeyOutKey()
def get_vgg_value_range(
    mean=(0.485 * 255, 0.456 * 255, 0.406 * 255),
    std=(0.229 * 255, 0.224 * 255, 0.225 * 255)):
  """Standard torchvision-style normalization. Ref :306."""
  mean_t, std_t = jnp.asarray(mean, jnp.float32), jnp.asarray(std, jnp.float32)
  return lambda img: (jnp.asarray(img, jnp.float32) - mean_t) / std_t


@Registry.register("preprocess_ops.clip_value_range")
@as_pp_op()
@InKeyOutKey()
def get_clip_value_range():
  """OpenAI-CLIP normalization constants. Ref :332."""
  mean = jnp.asarray(
      (0.48145466 * 255, 0.4578275 * 255, 0.40821073 * 255), jnp.float32)
  std = jnp.asarray(
      (0.26862954 * 255, 0.26130258 * 255, 0.27577711 * 255), jnp.float32)
  return lambda img: (jnp.asarray(img, jnp.float32) - mean) / std


@Registry.register("preprocess_ops.convert_to_video")
@as_pp_op()
@InKeyOutKey()
def get_convert_to_video(num_frames):
  """Image -> zero-padded video of `num_frames`. Ref :343."""
  def _to_video(image):
    image = jnp.asarray(image)[None]
    return jnp.pad(image, [[0, num_frames - 1], [0, 0], [0, 0], [0, 0]])
  return _to_video
