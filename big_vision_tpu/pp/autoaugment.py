"""RandAugment / AutoAugment image ops in pure JAX (device phase).

Behavioral parity target: reference big_vision/pp/autoaugment.py (the TF
AutoAugment op set used by the AugReg/how-to-train-your-ViT recipes). All
ops are jit/vmap-safe functions uint8 HWC -> uint8 HWC with static shapes,
so the whole augmentation pipeline fuses into the device pp program — zero
host cost (the reference runs these in tf.data C++ threads instead).

Op semantics follow the TF implementations (which approximate PIL):
  * geometric ops sample NEAREST and fill out-of-bounds with `replace`=128
    (the reference's wrap/unwrap trick, autoaugment.py:446-533);
  * enhance ops blend against a "degenerate" image (autoaugment.py:95-230);
  * equalize/autocontrast build per-channel LUTs from 256-bin histograms.

RandAugment: `num_layers` rounds of {pick 1 of 16 ops uniformly, apply at
`magnitude`} (autoaugment.py:662-700; the sampled per-op prob is unused in
the TF randaug path, so selected ops always apply).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from big_vision_tpu.registry import Registry
from big_vision_tpu.pp.utils import PPOp

_MAX_LEVEL = 10.0
_REPLACE = 128


# ---------------------------------------------------------------------------
# Pixel ops.
# ---------------------------------------------------------------------------


def blend(image1, image2, factor):
  """image1*(1-f) + image2*f, extrapolation clipped (uint8 in/out)."""
  diff = image2.astype(jnp.float32) - image1.astype(jnp.float32)
  out = image1.astype(jnp.float32) + factor * diff
  return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)


def invert(image):
  return 255 - image


def solarize(image, threshold=128):
  return jnp.where(image < threshold, image, 255 - image)


def solarize_add(image, addition=0, threshold=128):
  added = jnp.clip(image.astype(jnp.int32) + addition, 0, 255).astype(
      jnp.uint8)
  return jnp.where(image < threshold, added, image)


def posterize(image, bits):
  shift = 8 - bits
  return jnp.left_shift(jnp.right_shift(image, shift), shift)


def _to_gray(image):
  """ITU-R 601 luma, like tf.image.rgb_to_grayscale (rounded)."""
  rgb = image.astype(jnp.float32)
  gray = rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114
  return jnp.round(gray).astype(jnp.uint8)


def color(image, factor):
  gray = _to_gray(image)[..., None]
  degenerate = jnp.broadcast_to(gray, image.shape)
  return blend(degenerate, image, factor)


def brightness(image, factor):
  return blend(jnp.zeros_like(image), image, factor)


def contrast(image, factor):
  gray = _to_gray(image).astype(jnp.int32)
  hist = jnp.zeros((256,), jnp.int32).at[gray.ravel()].add(1)
  mean = jnp.sum(hist.astype(jnp.float32) *
                 jnp.arange(256, dtype=jnp.float32)) / gray.size
  degenerate = jnp.full(image.shape, jnp.clip(mean, 0, 255),
                        jnp.float32).astype(jnp.uint8)
  return blend(degenerate, image, factor)


def autocontrast(image):
  def scale_channel(ch):
    lo = jnp.min(ch).astype(jnp.float32)
    hi = jnp.max(ch).astype(jnp.float32)
    scale = 255.0 / jnp.where(hi > lo, hi - lo, 1.0)
    scaled = jnp.clip(ch.astype(jnp.float32) * scale - lo * scale, 0, 255)
    return jnp.where(hi > lo, scaled, ch.astype(jnp.float32)).astype(
        jnp.uint8)
  return jnp.stack([scale_channel(image[..., c]) for c in range(3)], -1)


def equalize(image):
  """PIL-style histogram equalization (TF variant, autoaugment.py:~390)."""
  def scale_channel(ch):
    ch = ch.astype(jnp.int32)
    histo = jnp.zeros((256,), jnp.int32).at[ch.ravel()].add(1)
    # count of the brightest present value (last nonzero bin):
    max_val = jnp.max(jnp.where(histo > 0, jnp.arange(256), 0))
    step = (jnp.sum(histo) - histo[max_val]) // 255
    lut = (jnp.cumsum(histo) + (step // 2)) // jnp.maximum(step, 1)
    lut = jnp.concatenate([jnp.zeros((1,), lut.dtype), lut[:-1]])
    lut = jnp.clip(lut, 0, 255)
    out = jnp.where(step == 0, ch, lut[ch])
    return out.astype(jnp.uint8)
  return jnp.stack([scale_channel(image[..., c]) for c in range(3)], -1)


def sharpness(image, factor):
  """3x3 smoothing conv; borders keep original pixels; blend by factor."""
  img = image.astype(jnp.float32)
  kernel = jnp.asarray([[1, 1, 1], [1, 5, 1], [1, 1, 1]],
                       jnp.float32) / 13.0
  # Depthwise conv: one 2D conv per channel.
  smoothed = jnp.stack([
      jax.lax.conv_general_dilated(
          img[None, :, :, c:c + 1], kernel[:, :, None, None],
          (1, 1), "VALID",
          dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]
      for c in range(3)], -1)
  smoothed = jnp.clip(smoothed, 0, 255).astype(jnp.uint8)
  padded = jnp.pad(smoothed, ((1, 1), (1, 1), (0, 0)))
  mask = jnp.pad(jnp.ones_like(smoothed), ((1, 1), (1, 1), (0, 0)))
  degenerate = jnp.where(mask == 1, padded, image)
  return blend(degenerate, image, factor)


def cutout(image, rng, pad_size, replace=_REPLACE):
  h, w = image.shape[0], image.shape[1]
  ky, kx = jax.random.split(rng)
  cy = jax.random.randint(ky, (), 0, h)
  cx = jax.random.randint(kx, (), 0, w)
  rows = jnp.arange(h)[:, None]
  cols = jnp.arange(w)[None, :]
  # TF builds the box from clipped pads: [cy-pad, cy+pad) x [cx-pad, cx+pad).
  mask = ((rows >= cy - pad_size) & (rows < cy + pad_size)
          & (cols >= cx - pad_size) & (cols < cx + pad_size))
  return jnp.where(mask[..., None], jnp.uint8(replace), image)


# ---------------------------------------------------------------------------
# Geometric ops: output->input affine with NEAREST sampling, `replace` fill.
# ---------------------------------------------------------------------------


def _affine_nearest(image, a, b, c, d, e, f, replace=_REPLACE):
  """x_in = a*x + b*y + c ; y_in = d*x + e*y + f (x=col, y=row)."""
  h, w = image.shape[0], image.shape[1]
  y_out = jnp.arange(h, dtype=jnp.float32)[:, None]
  x_out = jnp.arange(w, dtype=jnp.float32)[None, :]
  x_in = a * x_out + b * y_out + c
  y_in = d * x_out + e * y_out + f
  # TF's NEAREST sampling rounds half AWAY from zero (std::round);
  # jnp.round is half-to-even, which pairs up pixels whenever the shear
  # puts coordinates exactly on .5 (e.g. level*row = 1.5).
  _round_away = lambda v: jnp.sign(v) * jnp.floor(jnp.abs(v) + 0.5)
  xi = _round_away(x_in).astype(jnp.int32)
  yi = _round_away(y_in).astype(jnp.int32)
  valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
  xi = jnp.clip(xi, 0, w - 1)
  yi = jnp.clip(yi, 0, h - 1)
  sampled = image[yi, xi]
  return jnp.where(valid[..., None], sampled, jnp.uint8(replace))


def translate_x(image, pixels, replace=_REPLACE):
  """Shift content left by `pixels` (TF translate([-pixels, 0]))."""
  return _affine_nearest(image, 1.0, 0.0, pixels, 0.0, 1.0, 0.0, replace)


def translate_y(image, pixels, replace=_REPLACE):
  return _affine_nearest(image, 1.0, 0.0, 0.0, 0.0, 1.0, pixels, replace)


def shear_x(image, level, replace=_REPLACE):
  return _affine_nearest(image, 1.0, level, 0.0, 0.0, 1.0, 0.0, replace)


def shear_y(image, level, replace=_REPLACE):
  return _affine_nearest(image, 1.0, 0.0, 0.0, level, 1.0, 0.0, replace)


def rotate(image, degrees, replace=_REPLACE):
  """Counter-clockwise rotation around the image center (TF semantics)."""
  radians = jnp.deg2rad(degrees)
  h, w = image.shape[0], image.shape[1]
  cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
  cos, sin = jnp.cos(radians), jnp.sin(radians)
  # Output->input mapping of a CCW rotation.
  a, b = cos, -sin
  d, e = sin, cos
  c = cx - a * cx - b * cy
  f = cy - d * cx - e * cy
  return _affine_nearest(image, a, b, c, d, e, f, replace)


# ---------------------------------------------------------------------------
# Level tables (autoaugment.py:470-527) and RandAugment driver.
# ---------------------------------------------------------------------------


def _maybe_negate(rng, v):
  return jnp.where(jax.random.bernoulli(rng), -v, v)


def _enhance_level(level):
  return (level / _MAX_LEVEL) * 1.8 + 0.1


def _make_ops(magnitude, cutout_const=40, translate_const=100):
  """[(name, fn(image, rng) -> image)] in the reference's op order."""
  level = float(magnitude)
  enh = _enhance_level(level)
  shear_lvl = (level / _MAX_LEVEL) * 0.3
  trans_lvl = (level / _MAX_LEVEL) * translate_const
  rot_lvl = (level / _MAX_LEVEL) * 30.0
  post_bits = int((level / _MAX_LEVEL) * 4)
  solar_th = int((level / _MAX_LEVEL) * 256)
  solar_add = int((level / _MAX_LEVEL) * 110)
  cut_pad = int((level / _MAX_LEVEL) * cutout_const)

  return [
      ("AutoContrast", lambda im, rng: autocontrast(im)),
      ("Equalize", lambda im, rng: equalize(im)),
      ("Invert", lambda im, rng: invert(im)),
      ("Rotate", lambda im, rng: rotate(im, _maybe_negate(rng, rot_lvl))),
      ("Posterize", lambda im, rng: posterize(im, post_bits)),
      ("Solarize", lambda im, rng: solarize(im, solar_th)),
      ("Color", lambda im, rng: color(im, enh)),
      ("Contrast", lambda im, rng: contrast(im, enh)),
      ("Brightness", lambda im, rng: brightness(im, enh)),
      ("Sharpness", lambda im, rng: sharpness(im, enh)),
      ("ShearX", lambda im, rng: shear_x(im, _maybe_negate(rng, shear_lvl))),
      ("ShearY", lambda im, rng: shear_y(im, _maybe_negate(rng, shear_lvl))),
      ("TranslateX",
       lambda im, rng: translate_x(im, _maybe_negate(rng, trans_lvl))),
      ("TranslateY",
       lambda im, rng: translate_y(im, _maybe_negate(rng, trans_lvl))),
      ("Cutout", lambda im, rng: cutout(im, rng, cut_pad)),
      ("SolarizeAdd", lambda im, rng: solarize_add(im, solar_add)),
  ]


def distort_image_with_randaugment(image, num_layers, magnitude, rng):
  """RandAugment (arxiv.org/abs/1909.13719) on one uint8 HWC image."""
  ops = _make_ops(magnitude)
  branches = [
      (lambda op: lambda args: op(args[0], args[1]))(fn) for _, fn in ops]
  for _ in range(num_layers):
    rng, k_sel, k_op = jax.random.split(rng, 3)
    idx = jax.random.randint(k_sel, (), 0, len(ops))
    image = jax.lax.switch(idx, branches, (image, k_op))
  return image


@Registry.register("preprocess_ops.randaug")
def get_randaug(num_layers=2, magnitude=10, key="image", inkey=None,
                outkey=None):
  """pp op: device-side RandAugment. Ref pp/archive/randaug.py:22."""
  ik, ok = inkey or key, outkey or key

  def _op(data, rng):
    data = dict(data)
    data[ok] = distort_image_with_randaugment(
        jnp.asarray(data[ik], jnp.uint8), num_layers, magnitude, rng)
    return data

  return PPOp(fn=_op, random=True, name="randaug")
