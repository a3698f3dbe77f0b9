"""Few-shot linear-probe evaluator (closed-form ridge regression).

Parity target: reference evaluators/fewshot_lsr.py:39-245. Representations
come from the jit `represent` predict_fn; the L2-regularized least-squares
fit uses the eigendecomposition trick (one eigh, reusable across l2
values), computed on CPU.
"""

from __future__ import annotations


import jax
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.evaluators import common

API = "jit"
BIAS_CONSTANT = 100.0


def _precompute_cache(x, y, num_classes):
  """Whiten, add bias feature, eigendecompose (ref fewshot_lsr.py:39-91)."""
  mean = x.mean(axis=0, keepdims=True)
  std = x.std(axis=0, keepdims=True) + 1e-5
  x = (x - mean) / std
  x = np.pad(x, ((0, 0), (0, 1)), constant_values=BIAS_CONSTANT)
  y = 2.0 * (np.arange(num_classes) == y[:, None]).astype(np.float32) - 1.0

  n, d = x.shape
  if n >= d:
    eigs, q = np.linalg.eigh(x.T @ x)
    rhs = q.T @ (x.T @ y)
    lhs = q
  else:
    eigs, q = np.linalg.eigh(x @ x.T)
    rhs = q.T @ y
    lhs = x.T @ q
  return dict(eigs=eigs, rhs=rhs, lhs=lhs, mean=mean, std=std)


def _fewshot_acc(cache, x_test, y_test, l2_reg):
  x_test = (x_test - cache["mean"]) / cache["std"]
  x_test = np.pad(x_test, ((0, 0), (0, 1)), constant_values=BIAS_CONSTANT)
  scaling = (1.0 / (cache["eigs"] + l2_reg))[None, :]
  w = (cache["lhs"] * scaling) @ cache["rhs"]
  preds = np.argmax(x_test @ w, axis=1)
  return float(np.mean(preds == y_test))


class Evaluator:
  """cfg: datasets={name: dict(data_train=..., data_test=..., pp_train,
  pp_eval, num_classes)}, shots=(1,5,10,25), l2_reg, num_seeds."""

  def __init__(self, predict_fn, batch_size, devices, datasets, shots,
               l2_reg=2.0 ** 10, num_seeds=3, display_first=None,
               label_key="label", representation_layer=None, **kw):
    del kw
    self.shots = tuple(shots)
    self.l2_reg = l2_reg
    self.num_seeds = num_seeds
    self.label_key = label_key
    self.display_first = display_first

    @jax.jit
    def repr_fn(train_state, batch):
      out = predict_fn(train_state, batch)
      if representation_layer is not None:
        # Reference-style: features come from the predict fn's aux dict
        # (ref fewshot_lsr.py:141-149, e.g. "pre_logits").
        aux = out[-1] if isinstance(out, tuple) else out
        return aux[representation_layer]
      return out[0] if isinstance(out, tuple) else out
    self.repr_fn = repr_fn

    self.pipelines = {}
    for name, ds in datasets.items():
      ds = dict(ds)
      num_classes = ds.pop("num_classes")
      train_pipe = common.eval_input_pipeline(
          data=ds["data_train"], pp_fn=ds.get("pp_train", ds.get("pp")),
          batch_size=batch_size, devices=devices)
      test_pipe = common.eval_input_pipeline(
          data=ds["data_test"], pp_fn=ds.get("pp_eval", ds.get("pp")),
          batch_size=batch_size, devices=devices)
      self.pipelines[name] = (train_pipe, test_pipe, num_classes)

  def _embed(self, train_state, pipe):
    get_iter, steps = pipe
    xs, ys = [], []
    for _, batch in zip(range(steps), get_iter()):
      dev, _ = common.split_batch(batch)
      mask = np.asarray(
          u.get_local_slice_from_fsarray(dev.pop("_mask"))).astype(bool)
      labels = np.asarray(
          u.get_local_slice_from_fsarray(dev.pop(self.label_key)))
      dev.pop("_id", None)
      z = np.asarray(u.get_local_slice_from_fsarray(
          self.repr_fn(train_state, dev)))
      xs.append(z[mask])
      ys.append(labels[mask])
    return np.concatenate(xs), np.concatenate(ys)

  def run(self, train_state):
    for name, (train_pipe, test_pipe, num_classes) in self.pipelines.items():
      x_tr, y_tr = self._embed(train_state, train_pipe)
      x_te, y_te = self._embed(train_state, test_pipe)
      for shot in self.shots:
        accs = []
        for seed in range(self.num_seeds):
          rng = np.random.default_rng(seed)
          idx = []
          for cls in range(num_classes):
            cls_idx = np.nonzero(y_tr == cls)[0]
            if len(cls_idx) == 0:
              continue
            take = min(shot, len(cls_idx))
            idx.extend(rng.choice(cls_idx, take, replace=False))
          idx = np.asarray(idx)
          cache = _precompute_cache(x_tr[idx], y_tr[idx], num_classes)
          accs.append(_fewshot_acc(cache, x_te, y_te, self.l2_reg))
        key = f"{name}_{shot}shot"
        if self.display_first and (name, shot) in [
            tuple(p) for p in self.display_first]:
          yield (f"a/{key}", float(np.mean(accs)))
        else:
          yield (f"z/{key}", float(np.mean(accs)))
