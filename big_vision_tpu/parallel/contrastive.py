"""Chunked contrastive losses over the device mesh.

The reference's OSS SigLIP trainer materializes the full [B, B] global
logit matrix (trainers/proj/image_text/siglip.py:291-306) and carries a
TODO for the chunked version (:19). Here is that chunked version, the way
the SigLIP paper describes it: each device keeps its embedding shard in
place and the text shards rotate around the ring (lax.ppermute over ICI),
so peak memory is O(B * B/D) per device instead of O(B^2), and the
per-block matmul+loss fuse.

Differentiable end-to-end: ppermute has a well-defined transpose, so
jax.grad through the shard_mapped loss yields exact gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

P = jax.sharding.PartitionSpec


def _sigmoid_nll_block(zimg, ztxt, t, b, positives_diag):
  """-log sigmoid losses for one [bl, bl] block of image/text pairs."""
  logits = jnp.dot(zimg, ztxt.T, preferred_element_type=jnp.float32)
  logits = logits * t + b
  if positives_diag:
    signs = 2 * jnp.eye(zimg.shape[0], dtype=logits.dtype) - 1
  else:
    signs = -jnp.ones_like(logits)
  return -jnp.sum(jax.nn.log_sigmoid(signs * logits))


def chunked_siglip_loss(zimg, ztxt, t, b, *, axis_name):
  """Per-device partial SigLIP loss; call inside shard_map.

  Args:
    zimg, ztxt: this device's L2-normalized embedding shards [bl, D].
    t, b: temperature (already exp'd) and bias scalars (replicated).
    axis_name: mesh axis the batch is sharded over.

  Returns:
    Scalar: SUM of -log sigmoid over this device's image rows x the full
    global text batch. Callers divide psum(result) by the global batch.
  """
  n_dev = jax.lax.axis_size(axis_name)
  loss = _sigmoid_nll_block(zimg, ztxt, t, b, positives_diag=True)

  carry = ztxt
  perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
  for _ in range(n_dev - 1):
    carry = jax.lax.ppermute(carry, axis_name, perm)
    # After any rotation the diagonal pairs are negatives: positives live
    # only in the resident block.
    loss = loss + _sigmoid_nll_block(zimg, carry, t, b,
                                     positives_diag=False)
  return loss


def siglip_loss_fn(mesh, axis_name="data"):
  """Returns loss(zimg, ztxt, t, b) -> mean NLL over the global batch,
  computed chunked over `axis_name` without materializing [B, B]."""

  def local(zimg, ztxt, t, b):
    partial = chunked_siglip_loss(zimg, ztxt, t, b, axis_name=axis_name)
    return jax.lax.psum(partial, axis_name)

  sharded = jax.shard_map(
      local, mesh=mesh,
      in_specs=(P(axis_name), P(axis_name), P(), P()),
      out_specs=P())

  def loss_fn(zimg, ztxt, t, b):
    batch = zimg.shape[0]
    return sharded(zimg, ztxt, t, b) / batch

  return loss_fn


def global_siglip_loss(zimg, ztxt, t, b):
  """Reference semantics: full [B, B] logits (for testing/small batches)."""
  logits = jnp.dot(zimg, ztxt.T) * t + b
  signs = 2 * jnp.eye(zimg.shape[0], dtype=logits.dtype) - 1
  return -jnp.mean(jnp.sum(jax.nn.log_sigmoid(signs * logits), axis=-1))
