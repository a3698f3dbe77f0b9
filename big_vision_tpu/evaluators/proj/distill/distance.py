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


def dist(student, teacher, kind, feat_axis=-1, epsilon=1e-12, t=1, ls=0.0,
         k=1):
  """Distance between student/teacher representations (ref :35-68)."""
  diff = student - teacher
  if kind == "euclidean":
    return jnp.sqrt(jnp.sum(diff * diff, axis=feat_axis) + epsilon)
  if kind == "l2":
    return jnp.sum(diff * diff, axis=feat_axis)
  if kind == "hard":
    pseudo = jnp.argmax(teacher, feat_axis)
    pl = u.onehot(pseudo, teacher.shape[feat_axis])
    if ls:
      pl = (1.0 - ls) * pl + (ls / (pl.shape[-1] - 1)) * (1.0 - pl)
    return u.softmax_xent(logits=student, labels=pl, reduction=False,
                          kl=True, axis=feat_axis)
  if kind == "kl":
    return t ** 2 * u.softmax_xent(
        logits=student / t, labels=jax.nn.softmax(teacher / t),
        reduction=False, kl=True, axis=feat_axis)
  if kind == "logsoftmax_euclidean":
    d = (jax.nn.log_softmax(student, axis=feat_axis)
         - jax.nn.log_softmax(teacher, axis=feat_axis))
    return jnp.sqrt(jnp.sum(d * d, axis=feat_axis) + epsilon)
  if kind == "agree":
    def top_k(arr, kk):
      return jax.lax.top_k(arr.swapaxes(feat_axis, -1), kk)[1].swapaxes(
          feat_axis, -1)
    return (top_k(student, k) == top_k(teacher, 1)).sum(feat_axis)
  raise ValueError(f"Unknown distance kind {kind!r}")


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
