"""Loss functions shared by the trainers.

Behavioral parity targets: reference big_vision/utils.py:236-347.
All losses are pure jnp functions, safe under jit/vmap/shard_map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "onehot", "sigmoid_xent", "softmax_xent", "weighted_softmax_xent",
    "bidirectional_contrastive_loss", "accumulate_gradient",
]


def onehot(labels, num_classes, *, on_value=1.0, off_value=0.0):
  x = (labels[..., None] == jnp.arange(num_classes)[None])
  return jnp.where(x, on_value, off_value).astype(jnp.float32)


def sigmoid_xent(*, logits, labels, reduction=True):
  """Numerically-stable multi-label sigmoid cross-entropy."""
  log_p = jax.nn.log_sigmoid(logits)
  log_not_p = jax.nn.log_sigmoid(-logits)
  nll = -jnp.sum(labels * log_p + (1.0 - labels) * log_not_p, axis=-1)
  return jnp.mean(nll) if reduction else nll


def softmax_xent(*, logits, labels, reduction=True, kl=False, axis=-1):
  log_p = jax.nn.log_softmax(logits, axis=axis)
  nll = -jnp.sum(labels * log_p, axis=axis)
  if kl:
    nll += jnp.sum(labels * jnp.log(jnp.clip(labels, 1e-8)), axis=axis)
  return jnp.mean(nll) if reduction else nll


def weighted_softmax_xent(*, logits, labels, reduction=True, weights=None,
                          label_smoothing=0.0, normalize=True):
  """Per-sequence weighted CE over [batch, length, vocab] logits.

  `labels` are int ids [batch, length]; `weights` masks tokens. When
  `normalize`, each sequence's loss is divided by its token count.
  """
  if logits.ndim != labels.ndim + 1:
    raise ValueError(f"Bad shapes: logits {logits.shape} labels {labels.shape}")
  vocab = logits.shape[-1]
  confidence = 1.0 - label_smoothing
  off = label_smoothing / (vocab - 1)
  soft = onehot(labels, vocab, on_value=confidence, off_value=off)
  loss = -jnp.sum(soft * jax.nn.log_softmax(logits), axis=-1)

  norm = labels.shape[1]
  if weights is not None:
    loss = loss * weights
    norm = jnp.clip(weights.sum(axis=1), 2e-38)
  loss = loss.sum(axis=1)
  if normalize:
    loss = loss / norm
  return loss.mean() if reduction else loss


def bidirectional_contrastive_loss(zimg, ztxt, t, mask=None, reduction=False):
  """InfoNCE in both directions over normalized embeddings (global batch).

  NOTE: computes the full [B, B] logit matrix; the SigLIP trainer has a
  chunked shard_map variant in parallel/contrastive.py for large B.
  """
  logits = jnp.dot(zimg, ztxt.T) * t
  if mask is not None:
    exclude = jnp.logical_not(mask)
    exclude = jnp.logical_or(exclude[:, None], exclude[None, :])
    logits = jnp.where(exclude, -jnp.inf, logits)

  l1 = -jnp.diag(jax.nn.log_softmax(logits, axis=1))  # image -> text
  l2 = -jnp.diag(jax.nn.log_softmax(logits, axis=0))  # text -> image
  l = 0.5 * (l1 + l2)
  if mask is not None:
    l = jnp.where(mask, l, 0)

  redux = jnp.mean if reduction else (lambda x: x)
  if reduction and mask is not None:
    redux = lambda x: jnp.sum(x * mask) / (jnp.sum(mask) + 1e-8)
  ncorrect = redux(
      (jnp.argmax(logits, axis=1) == jnp.arange(len(logits))).astype(
          jnp.float32))
  return redux(l), {"ncorrect": ncorrect}


def accumulate_gradient(loss_and_grad_fn, params, images, labels, accum_steps):
  """Microbatched grad accumulation via fori_loop (memory for FLOPs)."""
  if not accum_steps or accum_steps <= 1:
    return loss_and_grad_fn(params, images, labels)
  assert images.shape[0] % accum_steps == 0, (
      f"accum_steps={accum_steps} must divide batch={images.shape[0]}")
  micro = images.shape[0] // accum_steps
  l, g = loss_and_grad_fn(params, images[:micro], labels[:micro])

  def body(i, carry):
    l, g = carry
    imgs = jax.lax.dynamic_slice_in_dim(images, i * micro, micro, axis=0)
    lbls = jax.lax.dynamic_slice_in_dim(labels, i * micro, micro, axis=0)
    li, gi = loss_and_grad_fn(params, imgs, lbls)
    return l + li, jax.tree.map(jnp.add, g, gi)

  l, g = jax.lax.fori_loop(1, accum_steps, body, (l, g))
  return jax.tree.map(lambda x: x / accum_steps, (l, g))
