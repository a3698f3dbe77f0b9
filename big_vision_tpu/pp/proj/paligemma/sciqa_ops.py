"""ScienceQA pp ops.

Parity target: reference pp/proj/paligemma/sciqa_ops.py.
"""

from __future__ import annotations

import string

import numpy as np

from big_vision_tpu.registry import Registry
from big_vision_tpu.pp.utils import PPOp


@Registry.register("preprocess_ops.sci_qa_choices_shuffle")
def get_sci_qa_choices_shuffle(choice_str_inkey="choices",
                               ans_inkey="answer",
                               indexed_choices_outkey="indexed_choices",
                               indexed_answer_outkey="indexed_answer"):
  """Shuffles answer choices; emits '(A) x, (B) y' and the new letter."""

  def _shuffle(data, np_rng):
    data = dict(data)
    choices = [c.decode() if isinstance(c, bytes) else str(c)
               for c in np.asarray(data[choice_str_inkey]).reshape(-1)]
    perm = np_rng.permutation(len(choices))
    shuffled = [choices[i] for i in perm]
    letters = string.ascii_uppercase
    data[indexed_choices_outkey] = ", ".join(
        f"({letters[i]}) {c}" for i, c in enumerate(shuffled))
    answer = int(np.asarray(data[ans_inkey]))
    new_idx = int(np.argmax(perm == answer))
    data[indexed_answer_outkey] = letters[new_idx]
    return data

  return PPOp(host_fn=_shuffle, phase="host", random=True,
              name="sci_qa_choices_shuffle")
