"""Tokenizer interface + registry.

Parity target: reference pp/tokenizer.py:26-104 (Tokenizer protocol,
`get_tokenizer` with lazy module import, `tokensets` extension vocab for
PaliGemma's loc/seg tokens).

Implementations:
  tokenizers.sp(model)   — SentencePiece (requires the sentencepiece pkg;
                           absent in this image, so gated with a clear error)
  tokenizers.hf(path)    — HuggingFace `tokenizers` tokenizer.json files
  tokenizers.test(n)     — deterministic hash-based word tokenizer for tests
                           and synthetic training (no external files)
"""

from __future__ import annotations

import functools
import hashlib
import importlib
import threading
from typing import Protocol

import numpy as np

from big_vision_tpu import registry as bvt_registry

Registry = bvt_registry.Registry


class Tokenizer(Protocol):
  def to_int(self, text, *, bos=False, eos=False):
    """Text (str or list[str]) -> list[int] (or list of lists)."""

  def to_str(self, tokens, *, stop_at_eos=True):
    """Inverse of to_int; strips control tokens."""

  @property
  def pad_token(self):
    ...

  @property
  def eos_token(self):
    ...

  @property
  def bos_token(self):
    ...

  @property
  def vocab_size(self):
    ...


@functools.cache
def get_tokenizer(name) -> Tokenizer:
  if not Registry.knows(f"tokenizers.{name}"):
    raw_name, *_ = bvt_registry.parse_name(name)
    importlib.import_module(f"big_vision_tpu.pp.{raw_name}")
  return Registry.lookup(f"tokenizers.{name}")()


def get_extra_tokens(tokensets):
  extra = []
  for ts in tokensets:
    extra.extend(Registry.lookup(f"tokensets.{ts}")())
  seen, out = set(), []
  for t in extra:
    if t not in seen:
      seen.add(t)
      out.append(t)
  return out


@Registry.register("tokensets.loc")
def _get_loc1024(n=1024):
  """PaliGemma detection coordinate tokens."""
  return [f"<loc{i:04d}>" for i in range(n)]


@Registry.register("tokensets.seg")
def _get_seg(n=128):
  """PaliGemma segmentation VQ tokens."""
  return [f"<seg{i:03d}>" for i in range(n)]


@Registry.register("tokensets.sp_extra_tokens")
def _get_sp_extra_tokens():
  """SentencePiece structural tokens (ref pp/ops_text_test.py:191).

  Making these visible lets decoding surface them; tokens absent from a
  vocab (e.g. "<pad>" in mistral) are appended, growing vocab_size.
  """
  return ["<s>", "</s>", "<pad>"]


class _ListOrOne:
  """Mixin handling str vs list[str] inputs uniformly."""

  def _one_to_int(self, text, bos, eos):
    raise NotImplementedError

  def to_int(self, text, *, bos=False, eos=False):
    if isinstance(text, (list, tuple, np.ndarray)):
      return [self._one_to_int(_as_str(t), bos, eos) for t in text]
    return self._one_to_int(_as_str(text), bos, eos)


def _as_str(t):
  return t.decode() if isinstance(t, bytes) else str(t)


@Registry.register("tokenizers.sp")
def get_sp_tokenizer(model="c4_en", add_bos=False, add_eos=True,
                     tokensets=()):
  """SentencePiece tokenizer (ref ops_text.py:322).

  Backend: the sentencepiece package when installed; otherwise the native
  pure-Python unigram implementation (pp/sentencepiece_native.py) reads
  the same .model file — no extra dependency for inference.
  """
  known = {
      "c4_en": "gs://t5-data/vocabs/cc_en.32000/sentencepiece.model",
      "cc_all": "gs://t5-data/vocabs/cc_all.32000/sentencepiece.model",
      "mc4": "gs://t5-data/vocabs/mc4.250000.100extra/sentencepiece.model",
      "t5": "gs://t5-data/vocabs/cc_all.32000/sentencepiece.model",
  }
  model = known.get(model, model)

  class SPTokenizer(_ListOrOne):
    """Reads the vocab lazily: constructing the tokenizer (and therefore
    parsing a pp string that names a remote gs:// vocab) needs no file
    access; the first encode/decode/property call materializes it."""

    def __init__(self):
      self._sp = None
      self._lock = threading.Lock()

    @property
    def sp(self):
      if self._sp is None:
        with self._lock:
          if self._sp is None:
            with open(model, "rb") as f:
              blob = f.read()
            try:
              import sentencepiece as spm
              sp = spm.SentencePieceProcessor(model_proto=blob)
            except ImportError:
              from big_vision_tpu.pp import sentencepiece_native
              sp = sentencepiece_native.SentencePieceNative(blob)
            self._extra_tokens = {
                t: sp.GetPieceSize() + i
                for i, t in enumerate(get_extra_tokens(tokensets))}
            self._sp = sp
      return self._sp

    @property
    def _extra(self):
      self.sp  # materialize
      return self._extra_tokens

    def _one_to_int(self, text, bos, eos):
      ids = self.sp.EncodeAsIds(text)
      if bos or add_bos:
        ids = [self.sp.bos_id()] + ids
      if eos or add_eos:
        ids = ids + [self.sp.eos_id()]
      return ids

    def to_str(self, tokens, *, stop_at_eos=True):
      tokens = list(map(int, tokens))
      if stop_at_eos and self.sp.eos_id() in tokens:
        tokens = tokens[:tokens.index(self.sp.eos_id())]
      return self.sp.DecodeIds(tokens)

    @property
    def pad_token(self):
      return self.sp.pad_id()

    @property
    def eos_token(self):
      return self.sp.eos_id()

    @property
    def bos_token(self):
      return self.sp.bos_id()

    @property
    def vocab_size(self):
      return self.sp.GetPieceSize() + len(self._extra)

    def string_to_id(self, s):
      return self._extra.get(s, self.sp.PieceToId(s))

  return SPTokenizer()


@Registry.register("tokenizers.hf")
def get_hf_tokenizer(path, tokensets=()):
  """HuggingFace tokenizers (Rust) backend for local tokenizer.json files."""
  from tokenizers import Tokenizer as HFTok

  class HFTokenizer(_ListOrOne):
    def __init__(self):
      self.tok = HFTok.from_file(path)
      for ts in tokensets:
        self.tok.add_tokens(Registry.lookup(f"tokensets.{ts}")())
      ids = {t: self.tok.token_to_id(t)
             for t in ("<pad>", "</s>", "<s>", "<bos>", "<eos>", "[PAD]")}
      self._pad = next((v for k, v in ids.items()
                        if v is not None and "pad" in k.lower()), 0)
      self._eos = next((v for k, v in ids.items()
                        if v is not None and ("/s" in k or "eos" in k)), 1)
      self._bos = next((v for k, v in ids.items()
                        if v is not None and ("<s>" == k or "bos" in k)), 2)

    def _one_to_int(self, text, bos, eos):
      ids = self.tok.encode(text, add_special_tokens=False).ids
      if bos:
        ids = [self._bos] + ids
      if eos:
        ids = ids + [self._eos]
      return ids

    def to_str(self, tokens, *, stop_at_eos=True):
      tokens = list(map(int, tokens))
      if stop_at_eos and self._eos in tokens:
        tokens = tokens[:tokens.index(self._eos)]
      return self.tok.decode(tokens, skip_special_tokens=True)

    @property
    def pad_token(self):
      return self._pad

    @property
    def eos_token(self):
      return self._eos

    @property
    def bos_token(self):
      return self._bos

    @property
    def vocab_size(self):
      return self.tok.get_vocab_size()

    def string_to_id(self, s):
      i = self.tok.token_to_id(s)
      return i if i is not None else self._pad

  return HFTokenizer()


@Registry.register("tokenizers.test")
def get_test_tokenizer(vocab_size=1000, tokensets=()):
  """Deterministic word-hash tokenizer: pad=0 eos=1 bos=2 unk=3.

  Invertibility is approximate (hash buckets), but id assignment is stable
  across runs/processes, which is all tests and synthetic data need.
  """

  class TestTokenizer(_ListOrOne):
    def __init__(self):
      self._extra = {t: vocab_size + i
                     for i, t in enumerate(get_extra_tokens(tokensets))}
      self._cache = {}

    def _word_id(self, w):
      if w in self._extra:
        return self._extra[w]
      if w not in self._cache:
        h = int.from_bytes(hashlib.sha256(w.encode()).digest()[:4], "little")
        self._cache[w] = 4 + h % (vocab_size - 4)
      return self._cache[w]

    def _one_to_int(self, text, bos, eos):
      ids = [self._word_id(w) for w in text.split()]
      if bos:
        ids = [2] + ids
      if eos:
        ids = ids + [1]
      return ids

    def to_str(self, tokens, *, stop_at_eos=True):
      tokens = list(map(int, tokens))
      if stop_at_eos and 1 in tokens:
        tokens = tokens[:tokens.index(1)]
      return " ".join(f"tok{t}" for t in tokens if t > 3)

    pad_token = 0
    eos_token = 1
    bos_token = 2

    @property
    def vocab_size(self):
      return vocab_size + len(self._extra)

    def string_to_id(self, s):
      if s == "<pad>":
        return 0
      if s == "</s>":
        return 1
      return self._word_id(s)

  return TestTokenizer()
