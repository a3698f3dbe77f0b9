"""Teacher-student distance functions + evaluator.

Parity target: reference evaluators/proj/distill/distance.py (the `dist`
kinds euclidean/l2/hard/kl/logsoftmax_euclidean/agree are the distillation
loss vocabulary, used by both the trainer and this evaluator).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.evaluators import common

API = "jit"


def _sq_norm(d, axis):
  return (d * d).sum(axis=axis)


def _hard(s, t, *, axis, ls, **_):
  # Cross-entropy against the teacher's (optionally smoothed) argmax.
  pseudo = u.onehot(jnp.argmax(t, axis), t.shape[axis])
  if ls:
    off = ls / (pseudo.shape[-1] - 1)
    pseudo = pseudo * (1.0 - ls - off) + off
  return u.softmax_xent(logits=s, labels=pseudo, reduction=False, kl=True,
                        axis=axis)


def _kl(s, t, *, axis, t_temp, **_):
  soft_teacher = jax.nn.softmax(t / t_temp, axis=axis)
  xent = u.softmax_xent(logits=s / t_temp, labels=soft_teacher,
                        reduction=False, kl=True, axis=axis)
  return t_temp ** 2 * xent


def _agree(s, t, *, axis, k, **_):
  def ranks(arr, kk):
    return jax.lax.top_k(arr.swapaxes(axis, -1), kk)[1].swapaxes(axis, -1)
  return (ranks(s, k) == ranks(t, 1)).sum(axis)


_KINDS = {
    "euclidean": lambda s, t, *, axis, eps, **_:
        jnp.sqrt(_sq_norm(s - t, axis) + eps),
    "l2": lambda s, t, *, axis, **_: _sq_norm(s - t, axis),
    "hard": _hard,
    "kl": _kl,
    "logsoftmax_euclidean": lambda s, t, *, axis, eps, **_:
        jnp.sqrt(_sq_norm(jax.nn.log_softmax(s, axis=axis)
                          - jax.nn.log_softmax(t, axis=axis), axis) + eps),
    "agree": _agree,
}


def dist(student, teacher, kind, feat_axis=-1, epsilon=1e-12, t=1, ls=0.0,
         k=1):
  """Distance between student/teacher representations (ref :35-68)."""
  if kind not in _KINDS:
    raise ValueError(f"Unknown distance kind {kind!r}; have {list(_KINDS)}")
  return _KINDS[kind](student, teacher, axis=feat_axis, eps=epsilon,
                      t_temp=t, ls=ls, k=k)


@functools.lru_cache(None)
def get_dist_fn(**kw):
  return functools.partial(dist, **kw)


class Evaluator:
  """Yields per-distance avg/min/max of student-teacher distances."""

  def __init__(self, student_teacher_fwd, distances,
               what=("logits", "logits"), **kw):
    self.get_data_iter, self.steps = common.eval_input_pipeline(**kw)
    self.dist_fns = tuple(get_dist_fn(**d) for d in distances)
    self.dist_names = ["_".join(f"{k}={v}" for k, v in d.items())
                       for d in distances]
    self.what = what
    self.fwd = student_teacher_fwd

    @jax.jit
    def eval_fn(train_state, batch):
      (_, out_s), (_, out_t) = self.fwd(train_state, batch)
      repr_s = u.tree_get(out_s, what[0])
      repr_t = u.tree_get(out_t, what[1])
      repr_s = repr_s.reshape(repr_s.shape[0], -1)
      repr_t = repr_t.reshape(repr_t.shape[0], -1)
      return [fn(repr_s, repr_t) for fn in self.dist_fns]
    self.eval_fn = eval_fn

  def run(self, train_state):
    all_ds = [[] for _ in self.dist_names]
    for _, batch in zip(range(self.steps), self.get_data_iter()):
      dev, _ = common.split_batch(batch)
      mask = np.asarray(u.get_local_slice_from_fsarray(dev.pop("_mask")))
      dev.pop("_id", None)
      vals = self.eval_fn(train_state, dev)
      for i, v in enumerate(vals):
        v = np.asarray(u.get_local_slice_from_fsarray(v))
        all_ds[i].append(v[mask == 1])
    for name, ds in zip(self.dist_names, all_ds):
      ds = np.concatenate(ds)
      yield (f"{name}/avg", float(np.mean(ds)))
      yield (f"{name}/min", float(np.min(ds)))
      yield (f"{name}/max", float(np.max(ds)))
