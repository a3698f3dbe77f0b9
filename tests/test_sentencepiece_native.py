"""Golden tests for the native SentencePiece backend.

The fixture .model is serialized by hand (protobuf wire format, see
sentencepiece_model.proto) with scores chosen so every Viterbi
segmentation below is hand-derivable — a real vocab round-trip that can't
silently drift: if the parser, normalizer, Viterbi, byte-fallback, or
decoder change behavior, the goldens break.
"""

import struct

import numpy as np
import pytest

from big_vision_tpu.pp import sentencepiece_native as spn


# --- protobuf writers -------------------------------------------------------

def _varint(n):
  if n < 0:
    n += 2 ** 64
  out = b""
  while True:
    b = n & 0x7F
    n >>= 7
    if n:
      out += bytes([b | 0x80])
    else:
      return out + bytes([b])


def _len_field(num, payload):
  return _varint(num << 3 | 2) + _varint(len(payload)) + payload


def _varint_field(num, val):
  return _varint(num << 3 | 0) + _varint(val)


def _piece(piece, score, ptype):
  msg = _len_field(1, piece.encode())
  msg += _varint(2 << 3 | 5) + struct.pack("<f", score)
  msg += _varint_field(3, ptype)
  return _len_field(1, msg)


def make_model(pieces, model_type=1, unk=0, bos=1, eos=2, pad=-1,
               add_dummy_prefix=True):
  blob = b"".join(_piece(*p) for p in pieces)
  trainer = (_varint_field(3, model_type) + _varint_field(40, unk)
             + _varint_field(41, bos) + _varint_field(42, eos)
             + _varint_field(43, pad))
  norm = (_len_field(1, b"nmt_nfkc")
          + _varint_field(3, int(add_dummy_prefix))
          + _varint_field(4, 1) + _varint_field(5, 1))
  return blob + _len_field(2, trainer) + _len_field(3, norm)


VOCAB = [
    ("<unk>", 0.0, spn.UNKNOWN),       # 0
    ("<s>", 0.0, spn.CONTROL),         # 1
    ("</s>", 0.0, spn.CONTROL),        # 2
    ("▁hello", -1.0, spn.NORMAL),      # 3
    ("▁world", -1.5, spn.NORMAL),      # 4
    ("▁", -3.0, spn.NORMAL),           # 5
    ("hell", -4.0, spn.NORMAL),        # 6
    ("o", -4.5, spn.NORMAL),           # 7
    ("wor", -4.0, spn.NORMAL),         # 8
    ("ld", -4.0, spn.NORMAL),          # 9
    ("he", -5.0, spn.NORMAL),          # 10
    ("llo", -5.0, spn.NORMAL),         # 11
    ("<ctrl>", 0.0, spn.USER_DEFINED), # 12
    ("<0x41>", -20.0, spn.BYTE),       # 13  'A'
    ("<0x42>", -20.0, spn.BYTE),       # 14  'B'
]


@pytest.fixture(scope="module")
def sp():
  return spn.SentencePieceNative(make_model(VOCAB))


def test_parse_roundtrip(sp):
  assert sp.GetPieceSize() == len(VOCAB)
  assert sp.unk_id() == 0 and sp.bos_id() == 1 and sp.eos_id() == 2
  assert sp.pad_id() == -1
  assert sp.PieceToId("▁hello") == 3
  assert sp.IdToPiece(4) == "▁world"


def test_viterbi_prefers_whole_words(sp):
  # "▁hello" (-1.0) beats "▁"+"hell"+"o" (-3-4-4.5) and "▁"+"he"+"llo".
  assert sp.EncodeAsPieces("hello") == ["▁hello"]
  assert sp.EncodeAsIds("hello world") == [3, 4]


def test_viterbi_composes_subwords(sp):
  # "helloworld": best split is ▁hello + wor + ld = -1-4-4 = -9
  # (vs ▁ + hell + o + wor + ld = -3-4-4.5-4-4).
  assert sp.EncodeAsPieces("helloworld") == ["▁hello", "wor", "ld"]


def test_whitespace_normalization(sp):
  # remove_extra_whitespaces collapses runs; dummy prefix adds one ▁.
  assert sp.EncodeAsIds("  hello   world  ") == [3, 4]


def test_unknown_chars_fall_back_to_unk(sp):
  # "▁" is a real piece (-3.0); the three unknown 'z' each map to unk.
  assert sp.EncodeAsIds("hello zzz") == [3, 5, 0, 0, 0]


def test_byte_fallback(sp):
  # 'A'/'B' are only reachable through BYTE pieces.
  ids = sp.EncodeAsIds("AB")
  assert 13 in ids and 14 in ids


def test_decode_golden(sp):
  assert sp.DecodeIds([3, 4]) == "hello world"
  assert sp.DecodeIds([1, 3, 4, 2]) == "hello world"  # control stripped
  assert sp.DecodeIds([3, 13, 14]) == "helloAB"        # bytes merged


def test_user_defined_always_extracted(sp):
  # "<ctrl>" must be cut out as one piece even though single chars lose.
  pieces = sp.EncodeAsPieces("hello<ctrl>")
  assert "<ctrl>" in pieces


def test_tokenizer_registry_uses_native_backend(tmp_path):
  model_file = tmp_path / "toy.model"
  model_file.write_bytes(make_model(VOCAB))
  from big_vision_tpu.pp import tokenizer as tok_mod
  tok = tok_mod.get_tokenizer(f'sp(model="{model_file}", add_eos=True)')
  ids = tok.to_int("hello world")
  assert ids == [3, 4, 2]  # eos appended
  assert tok.to_str([3, 4, 2]) == "hello world"
  assert tok.eos_token == 2
  assert tok.vocab_size == len(VOCAB)


def test_bpe_model_raises():
  with pytest.raises(NotImplementedError, match="unigram"):
    spn.SentencePieceNative(make_model(VOCAB, model_type=2))
