"""Text preprocessing ops (host phase: strings live on the host).

Parity target: reference pp/ops_text.py. The `tokenize` op reproduces the
reference's eos modes exactly (ops_text.py:114-205):

  eos="none":   tokens, truncated/padded to max_len, no eos.
  eos="yes":    tokens + eos, truncated to max_len (eos may be cut).
  eos="sticky": last kept token is ALWAYS eos (contrastive "last" pooling).
"""

from __future__ import annotations

import numpy as np

from big_vision_tpu.registry import Registry
# Late-bound module-attr access (not a by-value import): tests patch
# tokenizer.get_tokenizer, and a by-value binding taken mid-patch would
# leak the patched function forever into this module.
from big_vision_tpu.pp import tokenizer as bv_tok
from big_vision_tpu.pp.utils import PPOp


def _pad_tokens(ids, max_len, pad_value, eos_token, force_eos):
  ids = list(ids)
  if force_eos:
    if len(ids) >= max_len:
      ids = ids[:max_len - 1] + [eos_token]
  ids = ids[:max_len]
  return np.asarray(ids + [pad_value] * (max_len - len(ids)), np.int32)


@Registry.register("preprocess_ops.tokenize")
def get_pp_tokenize(max_len, eos, model="c4_en", lower=True,
                    sample_if_multi=True, pad_value="<pad>", add_bos=False,
                    key=None, inkey=None, outkey="labels"):
  """Tokenizes data[inkey] into int32 [max_len] (host op). Ref :114."""
  if eos not in ("yes", "none", "sticky"):
    raise ValueError(f"Invalid eos mode {eos!r}")
  # The vocab file is NOT read here: pp-string parsing stays pure so
  # configs referencing remote vocabs (gs://...) can be parsed, validated,
  # and sharded without network access; the tokenizer materializes in the
  # loader threads on first use (and get_tokenizer caches it).
  _state = {}

  def _resolve():
    if "tok" not in _state:
      try:
        tok = bv_tok.get_tokenizer(model)
      except (ValueError, KeyError, ModuleNotFoundError):
        # Reference semantics (ops_text.py:64): a bare name/path means a
        # SentencePiece vocab (known alias or .model file path). eos/bos
        # are applied per-call below, so the backend adds none by default.
        tok = bv_tok.get_tokenizer(f'sp(model="{model}", add_eos=False)')
      _state["tok"] = tok
      _state["pad"] = (tok.string_to_id(pad_value)
                       if isinstance(pad_value, str) else pad_value)
    return _state["tok"], _state["pad"]

  ik = key or inkey
  ok = key or outkey
  assert ik, "tokenize needs key= or inkey="

  def _tokenize_one(txt):
    tokenizer, pad = _resolve()
    if isinstance(txt, bytes):
      txt = txt.decode()
    if lower:
      txt = txt.lower()
    ids = tokenizer.to_int(txt, bos=add_bos, eos=eos != "none")
    return _pad_tokens(ids, max_len, pad, tokenizer.eos_token,
                       force_eos=eos == "sticky")

  def _op(data, np_rng):
    data = dict(data)
    txt = data[ik]
    if sample_if_multi and isinstance(txt, (list, tuple, np.ndarray)):
      txt = txt[int(np_rng.integers(0, len(txt)))] if len(txt) else ""
      data[ok] = _tokenize_one(txt)
    elif isinstance(txt, (list, tuple, np.ndarray)):
      data[ok] = np.stack([_tokenize_one(t) for t in txt])
    else:
      data[ok] = _tokenize_one(txt)
    return data

  return PPOp(host_fn=_op, phase="host", random=True, staticizer=True,
              name="tokenize")


@Registry.register("preprocess_ops.lower")
def get_lower(key="text", inkey=None, outkey=None):
  """Lowercases a string field. Ref :239."""
  ik, ok = inkey or key, outkey or key

  def _op(data):
    data = dict(data)
    v = data[ik]
    data[ok] = v.decode().lower() if isinstance(v, bytes) else str(v).lower()
    return data

  return PPOp(host_fn=_op, phase="host", name="lower")


@Registry.register("preprocess_ops.strfmt")
def get_strfmt(template, outkey="text"):
  """Formats a string template with fields from the data dict. Ref :250."""

  def _op(data):
    data = dict(data)
    fields = {k: (v.decode() if isinstance(v, bytes) else v)
              for k, v in data.items() if not k.startswith("_")}
    data[outkey] = template.format(**fields)
    return data

  return PPOp(host_fn=_op, phase="host", name="strfmt")


@Registry.register("preprocess_ops.clip_i1k_label_names")
def get_clip_i1k_label_names(key="label", outkey="labels"):
  """Maps an i1k label id to its CLIP class-name string. Ref :217."""
  from big_vision_tpu.datasets import imagenet as imagenet_data
  names = imagenet_data.clip_imagenet_class_names()

  def _op(data):
    data = dict(data)
    data[outkey] = names[int(data[key])]
    return data

  return PPOp(host_fn=_op, phase="host", name="clip_i1k_label_names")


@Registry.register("preprocess_ops.i21k_label_names")
def get_i21k_label_names(key="label", outkey="labels"):
  """Maps an i21k label id to its class-name string. Ref :228."""
  from big_vision_tpu.datasets import imagenet as imagenet_data
  names = imagenet_data.imagenet21k_class_names()

  def _op(data):
    data = dict(data)
    data[outkey] = names[int(data[key])]
    return data

  return PPOp(host_fn=_op, phase="host", name="i21k_label_names")


@Registry.register("preprocess_ops.coco_captions")
def get_coco_captions(outkey="captions"):
  """Lifts nested COCO 'captions/text' to a flat key. Ref :206."""

  def _op(data):
    data = dict(data)
    caps = data["captions"]
    if isinstance(caps, dict):
      caps = caps["text"]
    data[outkey] = caps
    return data

  return PPOp(host_fn=_op, phase="host", name="coco_captions")
