"""Interactive PaliGemma runner: load a checkpoint, caption/VQA an image.

Parity target: reference trainers/proj/paligemma/run.py. Reads prompts
from stdin, decodes with the fully-jitted while_loop decoder, prints the
detokenized answer. Params are FSDP-sharded over all local devices.

Usage:
  python -m big_vision_tpu.trainers.proj.paligemma.run \
      --ckpt /path/to/paligemma.npz --image /path/to/img.jpg
"""

from __future__ import annotations

import functools
import sys

from absl import app, flags, logging
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

CKPT = flags.DEFINE_string("ckpt", default=None, help="Checkpoint path.")
IMAGE = flags.DEFINE_string("image", default=None, help="Input image.")
SAMPLER = flags.DEFINE_string(
    "sampler", default="greedy", help="Decoding strategy, e.g. nucleus(0.1)")
RES = flags.DEFINE_integer("res", default=224, help="Image resolution.")
MAX_DECODE_LEN = flags.DEFINE_integer(
    "max_decode_len", default=128, help="Max total generation steps.")
PREFILL_LEN = flags.DEFINE_integer(
    "prefill_len", default=32, help="Prompt prefill size.")
CKPT_DTYPE = flags.DEFINE_string(
    "ckpt_dtype", default=None, help="Cast ckpt to dtype (e.g. float16).")

TOKENIZER = "gemma(tokensets=['loc', 'seg'])"


def load_model(ckpt):
  model_cfg = ml_collections.FrozenConfigDict(dict(
      img=dict(variant="So400m/14", pool_type="none", scan=True),
      llm=dict(vocab_size=256_000 + 1024 + 128),
  ))
  model = model_mod.Model(**model_cfg)
  params = model_mod.load(None, ckpt, model_cfg)
  return model, params


def info(s, *a):
  logging.info("[33mNOTE[0m: " + s, *a)


def main(argv):
  del argv
  jax.config.update("jax_transfer_guard", "disallow")
  info("Loading model...")
  with jax.transfer_guard("allow"):
    model, params = load_model(CKPT.value)

  fns = predict_fns.get_all(
      model, max_decode_len=MAX_DECODE_LEN.value, sampler=SAMPLER.value)

  info("Loading tokenizer...")
  tokzr = big_vision_tpu.pp.tokenizer.get_tokenizer(TOKENIZER)

  info("Creating mesh and sharding params...")
  mesh = Mesh(np.asarray(jax.devices()), ("data",))
  repl_sharding = NamedSharding(mesh, PartitionSpec())
  params_sharding = bv_sharding.infer_sharding(
      params, strategy=[(".*", "fsdp(axis='data')")], mesh=mesh)
  with jax.transfer_guard("allow"):
    params = u.reshard(params, params_sharding)
  if CKPT_DTYPE.value:
    cast = lambda x: (x.astype(CKPT_DTYPE.value)
                      if np.issubdtype(x.dtype, np.floating) else x)
    params = jax.jit(lambda p: jax.tree.map(cast, p), donate_argnums=(0,),
                     out_shardings=params_sharding)(params)

  pp_fn = big_vision_tpu.pp.builder.get_preprocess_fn("|".join([
      f"decode|resize({RES.value})|value_range(-1, 1)",
      f"tok(key='prefix', bos='yes', model={TOKENIZER!r})",
      f"tok(key='septok', text='\\n', model={TOKENIZER!r})",
      "masked_concat(['prefix', 'septok'], mask_ar=[0, 0],"
      " mask_input=[1, 1])",
      f"tolen({PREFILL_LEN.value}, pad_value=0, key='text')",
      f"tolen({PREFILL_LEN.value}, pad_value=1, key='mask_ar')",
      f"tolen({PREFILL_LEN.value}, pad_value=0, key='mask_input')",
      "keep('image', 'text', 'mask_ar', 'mask_input')",
  ]))

  decode = functools.partial(fns["decode"])

  def make_batch(fname, prompt):
    with open(fname, "rb") as f:
      image = f.read()
    example = pp_fn({"image": image, "prefix": np.array(prompt)})
    example["_mask"] = np.array(True)
    batch = jax.tree.map(lambda x: np.asarray(x)[None], example)
    with jax.transfer_guard("allow"):
      return u.reshard(batch, repl_sharding)

  info("Precompiling inference function...")
  decode({"params": params}, make_batch(IMAGE.value, "caption en"))

  info("Type a prompt and press enter, e.g. 'caption en': ")
  for line in map(str.strip, sys.stdin):
    tokens = decode({"params": params}, make_batch(IMAGE.value, line))
    with jax.transfer_guard("allow"):
      tokens = jax.device_get(tokens)[0]
    print(tokzr.to_str(tokens), flush=True)


if __name__ == "__main__":
  flags.mark_flag_as_required("ckpt")
  flags.mark_flag_as_required("image")
  app.run(main)
