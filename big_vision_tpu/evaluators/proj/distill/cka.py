"""Minibatch CKA between student and teacher representations.

Referenced by the reference's distill configs
(configs/proj/distill/bit_i1k.py:152: ``type='proj.distill.cka'``) but
absent from the public reference snapshot; implemented here following the
published minibatch-CKA estimator (Nguyen et al. 2021, "Do Wide and Deep
Networks Learn the Same Things?", eq. 3): accumulate the unbiased HSIC
terms over minibatches and combine at the end,

    CKA = mean_b HSIC1(K_b, L_b)
          / sqrt(mean_b HSIC1(K_b, K_b)) / sqrt(mean_b HSIC1(L_b, L_b))

with linear kernels K = X Xᵀ. HSIC1 is the unbiased estimator (Song et
al. 2012), which is why batch padding is not allowed (the reference
config carries the same caveat, bit_i1k.py:148-149): padded rows would
bias every Gram matrix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.evaluators import common

API = "jit"


def hsic1(gram_k, gram_l):
  """Unbiased HSIC estimator on [n, n] Gram matrices (n >= 4)."""
  n = gram_k.shape[0]
  k = gram_k * (1.0 - jnp.eye(n, dtype=gram_k.dtype))  # zero the diagonal
  l = gram_l * (1.0 - jnp.eye(n, dtype=gram_l.dtype))
  ks, ls = jnp.sum(k, axis=1), jnp.sum(l, axis=1)
  term1 = jnp.sum(k * l)  # tr(K L) for symmetric matrices
  term2 = jnp.sum(ks) * jnp.sum(ls) / ((n - 1) * (n - 2))
  term3 = 2.0 / (n - 2) * jnp.dot(ks, ls)
  return (term1 + term2 - term3) / (n * (n - 3))


class Evaluator:
  """Yields the minibatch-CKA between two forward passes' representations."""

  def __init__(self, student_teacher_fwd, what=("logits", "logits"), **kw):
    self.get_data_iter, self.steps = common.eval_input_pipeline(**kw)
    self.fwd = student_teacher_fwd

    @jax.jit
    def eval_fn(train_state, batch):
      (_, out_s), (_, out_t) = self.fwd(train_state, batch)
      xs = u.tree_get(out_s, what[0])
      xt = u.tree_get(out_t, what[1])
      xs = xs.reshape(xs.shape[0], -1).astype(jnp.float32)
      xt = xt.reshape(xt.shape[0], -1).astype(jnp.float32)
      xs = xs - xs.mean(axis=0, keepdims=True)
      xt = xt - xt.mean(axis=0, keepdims=True)
      gram_s = xs @ xs.T
      gram_t = xt @ xt.T
      return (hsic1(gram_s, gram_t), hsic1(gram_s, gram_s),
              hsic1(gram_t, gram_t))
    self.eval_fn = eval_fn

  def run(self, train_state):
    cross, s_norm, t_norm, n = 0.0, 0.0, 0.0, 0
    for _, batch in zip(range(self.steps), self.get_data_iter()):
      dev, _ = common.split_batch(batch)
      mask = np.asarray(u.get_local_slice_from_fsarray(dev.pop("_mask")))
      dev.pop("_id", None)
      if not mask.all():
        raise ValueError(
            "CKA does not support batch padding: make the split size a "
            "multiple of the batch size (ref bit_i1k.py:148-149).")
      st, ss, tt = jax.device_get(self.eval_fn(train_state, dev))
      cross += float(st)
      s_norm += float(ss)
      t_norm += float(tt)
      n += 1
    del n  # means share the same count; it cancels in the ratio
    yield ("cka", cross / (np.sqrt(s_norm) * np.sqrt(t_norm) + 1e-12))
