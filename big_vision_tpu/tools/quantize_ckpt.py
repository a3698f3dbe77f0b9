"""Offline checkpoint quantization for serving.

Converts a float Gemma (or PaliGemma) checkpoint into the int8 +
per-output-channel-scale layout `gemma.Model(quant=True)` serves from
(see models/ppp/gemma.py `quantize_params`): quantize once on the host,
then every server loads ~4x fewer bytes and streams 1 byte/weight per AR
step. No reference counterpart (the reference serves float checkpoints
only); the numbers motivating this are in docs/perf_notes.md "Serving".

Usage:
  # Pure Gemma checkpoint (orbax dir or npz), emit serving layout:
  python -m big_vision_tpu.tools.quantize_ckpt \
      --ckpt gemma2b-orbax/ --out gemma2b-int8.npz --layout unrolled

  # PaliGemma: quantize only the LLM subtree, keep the vision tower float:
  python -m big_vision_tpu.tools.quantize_ckpt \
      --ckpt paligemma.npz --subtree llm --out paligemma-int8.npz

Serve with e.g. `llm=dict(variant=..., quant=True, scan=False)` — the
saved tree is exactly what that model's `.init` declares.
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from big_vision_tpu.models.ppp import gemma
import big_vision_tpu.utils as u
from big_vision_tpu.utils import checkpoints


def _is_pyloop(p):
  return isinstance(p.get("layers"), dict) and "0" in p["layers"]


def quantize_tree(params, layout="unrolled"):
  """Float gemma param tree (either layer layout) -> int8 serving tree."""
  if layout not in ("unrolled", "scan", "keep"):
    raise ValueError(f"layout must be unrolled|scan|keep, got {layout!r}")
  if layout != "keep":
    want_pyloop = layout == "unrolled"
    if _is_pyloop(params) != want_pyloop:
      params = (gemma.scan_to_pyloop(params) if want_pyloop
                else gemma.pyloop_to_scan(params))
  return jax.device_get(gemma.quantize_params(params))


def main(argv=None):
  p = argparse.ArgumentParser()
  p.add_argument("--ckpt", required=True,
                 help="input checkpoint: .npz (optionally 'f.npz:sub') "
                      "or an orbax Gemma release dir")
  p.add_argument("--out", required=True, help="output .npz path")
  p.add_argument("--subtree", default=None,
                 help="quantize only this subtree (e.g. 'llm' for "
                      "PaliGemma), pass the rest through unchanged")
  p.add_argument("--layout", default="unrolled",
                 choices=["unrolled", "scan", "keep"],
                 help="layer layout of the output: unrolled (serving "
                      "default, ~2.2x faster AR decode), scan (training "
                      "layout), keep (whatever the input used)")
  args = p.parse_args(argv)

  if args.ckpt.endswith(".npz") or ".npz:" in args.ckpt:
    params = u.load_params(args.ckpt)
  else:
    params = gemma._load_orbax(args.ckpt)  # pylint: disable=protected-access
    gemma._del_pad_rows(params)  # pylint: disable=protected-access
    gemma._maybe_transpose_gating_einsum(params)  # pylint: disable=protected-access

  if args.subtree and args.subtree not in params:
    raise SystemExit(
        f"--subtree {args.subtree!r} not in the checkpoint's top-level "
        f"keys {sorted(params)} (orbax Gemma trees are already the bare "
        "LLM — omit --subtree; npz trees may nest, e.g. --subtree=llm).")
  target = params[args.subtree] if args.subtree else params
  quantized = quantize_tree(target, args.layout)
  if args.subtree:
    params = dict(params, **{args.subtree: quantized})
  else:
    params = quantized

  checkpoints.npz_save(params, args.out)
  n_int8 = sum(x.size for x in jax.tree.leaves(params)
               if np.asarray(x).dtype == np.int8)
  n_bytes = sum(np.asarray(x).nbytes for x in jax.tree.leaves(params))
  print(f"wrote {args.out}: {n_int8:,} int8 weights, "
        f"{n_bytes / 1e9:.3f} GB total")


if __name__ == "__main__":
  main()
