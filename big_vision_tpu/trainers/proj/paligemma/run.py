"""Interactive PaliGemma runner: load a checkpoint, caption/VQA an image.

Parity target: reference trainers/proj/paligemma/run.py. Reads prompts
from stdin, decodes with the fully-jitted while_loop decoder, prints the
detokenized answer. Params are FSDP-sharded over all local devices.

Usage:
  python -m big_vision_tpu.trainers.proj.paligemma.run \
      --ckpt /path/to/paligemma.npz --image /path/to/img.jpg
"""

from __future__ import annotations

import argparse
import sys

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec
import ml_collections
import numpy as np

import big_vision_tpu.models.proj.paligemma.paligemma as model_mod
import big_vision_tpu.pp.builder
import big_vision_tpu.pp.tokenizer
import big_vision_tpu.pp.ops_image  # noqa: F401
import big_vision_tpu.pp.ops_general  # noqa: F401
import big_vision_tpu.pp.ops_text  # noqa: F401
import big_vision_tpu.pp.proj.paligemma.ops  # noqa: F401
import big_vision_tpu.sharding as bv_sharding
import big_vision_tpu.trainers.proj.paligemma.predict_fns as predict_fns
import big_vision_tpu.utils as u

TOKENIZER = "gemma(tokensets=['loc', 'seg'])"


def parse_args(argv=None):
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--ckpt", required=True, help="Checkpoint path.")
  p.add_argument("--image", required=True, help="Input image.")
  p.add_argument("--sampler", default="greedy",
                 help="Decoding strategy, e.g. nucleus(0.1)")
  p.add_argument("--res", type=int, default=224, help="Image resolution.")
  p.add_argument("--max_decode_len", type=int, default=128,
                 help="Max total generation steps.")
  p.add_argument("--prefill_len", type=int, default=32,
                 help="Prompt prefill size.")
  p.add_argument("--ckpt_dtype", default=None,
                 help="Cast ckpt to dtype (e.g. float16).")
  return p.parse_args(argv)


class Session:
  """A sharded PaliGemma with its preprocessing + decode plumbing."""

  def __init__(self, args):
    self.args = args
    u.write_note("Loading model...")
    model_cfg = ml_collections.FrozenConfigDict(dict(
        img=dict(variant="So400m/14", pool_type="none", scan=True),
        llm=dict(vocab_size=256_000 + 1024 + 128),
    ))
    self.model = model_mod.Model(**model_cfg)
    with jax.transfer_guard("allow"):
      params = model_mod.load(None, args.ckpt, model_cfg)

    u.write_note("Loading tokenizer...")
    self.tokzr = big_vision_tpu.pp.tokenizer.get_tokenizer(TOKENIZER)

    u.write_note("Creating mesh and sharding params...")
    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    self.repl_sharding = NamedSharding(mesh, PartitionSpec())
    params_sharding = bv_sharding.infer_sharding(
        params, strategy=[(".*", "fsdp(axis='data')")], mesh=mesh)
    with jax.transfer_guard("allow"):
      params = u.reshard(params, params_sharding)
    if args.ckpt_dtype:
      def cast(x):
        if np.issubdtype(x.dtype, np.floating):
          return x.astype(args.ckpt_dtype)
        return x
      params = jax.jit(lambda p: jax.tree.map(cast, p), donate_argnums=(0,),
                       out_shardings=params_sharding)(params)
    self.params = params

    self.decode = predict_fns.get_all(
        self.model, max_decode_len=args.max_decode_len,
        sampler=args.sampler)["decode"]
    self.pp_fn = big_vision_tpu.pp.builder.get_preprocess_fn("|".join([
        f"decode|resize({args.res})|value_range(-1, 1)",
        f"tok(key='prefix', bos='yes', model={TOKENIZER!r})",
        f"tok(key='septok', text='\\n', model={TOKENIZER!r})",
        "masked_concat(['prefix', 'septok'], mask_ar=[0, 0],"
        " mask_input=[1, 1])",
        f"tolen({args.prefill_len}, pad_value=0, key='text')",
        f"tolen({args.prefill_len}, pad_value=1, key='mask_ar')",
        f"tolen({args.prefill_len}, pad_value=0, key='mask_input')",
        "keep('image', 'text', 'mask_ar', 'mask_input')",
    ]))

  def answer(self, image_bytes, prompt):
    example = self.pp_fn({"image": image_bytes, "prefix": np.array(prompt)})
    example["_mask"] = np.array(True)
    batch = jax.tree.map(lambda x: np.asarray(x)[None], example)
    with jax.transfer_guard("allow"):
      batch = u.reshard(batch, self.repl_sharding)
    tokens = self.decode({"params": self.params}, batch)
    with jax.transfer_guard("allow"):
      return self.tokzr.to_str(jax.device_get(tokens)[0])


def main(argv=None):
  args = parse_args(argv)
  jax.config.update("jax_transfer_guard", "disallow")
  session = Session(args)
  with open(args.image, "rb") as f:
    image_bytes = f.read()

  u.write_note("Precompiling inference function...")
  session.answer(image_bytes, "caption en")

  u.write_note("Type a prompt and press enter, e.g. 'caption en': ")
  for line in map(str.strip, sys.stdin):
    print(session.answer(image_bytes, line), flush=True)


if __name__ == "__main__":
  main()
