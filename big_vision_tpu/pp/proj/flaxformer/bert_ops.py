"""BERT WordPiece tokenization pp op.

Parity target: reference pp/proj/flaxformer/bert_ops.py, which uses
tensorflow_text.BertTokenizer. Here the backend is the pure-python
WordPiece tokenizer from `transformers` (baked into this image), driven by
the same vocab.txt file from the original BERT release; output layout
matches: [CLS] + tokens, zero-padded to max_len.
"""

from __future__ import annotations

import functools

import numpy as np

from big_vision_tpu.registry import Registry
from big_vision_tpu.pp.utils import PPOp


@functools.lru_cache(maxsize=None)
def _create_bert_tokenizer(vocab_path):
  """Returns (cls_token_id, tokenizer)."""
  try:
    from transformers import BertTokenizerFast
  except ImportError as e:
    raise NotImplementedError(
        "bert_tokenize needs the `transformers` package for its WordPiece "
        "backend (tensorflow_text in the reference).") from e
  tok = BertTokenizerFast(vocab_file=vocab_path, do_lower_case=True)
  with open(vocab_path) as f:
    vocab = f.read().split("\n")
  return vocab.index("[CLS]"), tok


@Registry.register("preprocess_ops.bert_tokenize")
def get_pp_bert_tokenize(vocab_path, max_len, sample_if_multi=True,
                         key=None, inkey=None, outkey="labels"):
  """WordPiece-tokenizes one text: [CLS] + ids, zero-padded to max_len."""
  ik = inkey or key
  ok = outkey

  def _bert_tokenize(data, np_rng):
    cls_token, tokenizer = _create_bert_tokenizer(vocab_path)
    data = dict(data)
    texts = np.asarray(data[ik]).reshape(-1)
    texts = [t.decode() if isinstance(t, bytes) else str(t) for t in texts]
    if sample_if_multi and len(texts) > 1:
      txt = texts[int(np_rng.integers(0, len(texts)))]
    else:
      txt = texts[0] if texts else ""
    ids = tokenizer.encode(txt, add_special_tokens=False)[:max_len - 1]
    out = np.zeros((max_len,), np.int32)
    out[0] = cls_token
    out[1:1 + len(ids)] = ids
    data[ok] = out
    return data

  return PPOp(host_fn=_bert_tokenize, phase="host", random=True,
              staticizer=True, name="bert_tokenize")
