"""UViM stage-I: ViT VQ-VAE over task outputs (panoptic/depth/color).

Behavior parity: reference models/proj/uvim/vit.py — straight-through
vector quantization, EMA codebook with discounted counts, dead-codeword
revival by splitting the most frequent embedding, learned bottleneck
down/upsampling (or bilinear resize), optional image-context stems.

TPU-first notes:
  * `quantize` is one batched MXU matmul (scores = 2.x@e^T - ||e||^2)
    instead of the reference's double-vmap of per-vector dots; argmax of
    the affine score equals argmin of the euclidean distance.
  * The codebook statistics are scatter-adds over *global* batch arrays
    under jit/GSPMD, so no psum is needed; `statistics_axis_name` defaults
    to None and only matters inside explicit shard_map regions (the
    reference defaults to "batch" for its pmap trainer).
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence, Union

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.models import common, vit

# Multiplicative jitter for codeword splitting. Not perfectly symmetric
# (repeated application could shrink codewords) but irrelevant in practice.
PERTURB = 0.001


def quantize(x, e):
  """Nearest codeword with straight-through gradient.

  Args:
    x: [..., D] vectors to quantize.
    e: [K, D] codebook.

  Returns:
    (x_q, idx): quantized vectors (forward pass: e[idx]; backward pass:
    identity on x) and codeword indices.
  """
  # argmin_k ||x - e_k||^2 == argmax_k (2 x.e_k - ||e_k||^2): one batched
  # matmul on the MXU; the ||x||^2 term is constant in k and dropped.
  scores = 2 * jnp.einsum("...d,kd->...k", x, e) - jnp.sum(e * e, axis=-1)
  idx = jnp.argmax(scores, axis=-1)
  return x + jax.lax.stop_gradient(e[idx] - x), idx


def split_the_most_frequent_embedding(state):
  """Replaces the least-used codeword with a perturbed copy of the most
  used one, halving its counts (dead-codebook revival)."""
  key, subkey = jax.random.split(state["rng"])
  book, usage = state["dictionary"], state["counts"]
  hot, cold = jnp.argmax(usage), jnp.argmin(usage)

  jitter = jax.random.uniform(subkey, (book.shape[1],), jnp.float32,
                              1.0 - PERTURB, 1.0 + PERTURB)
  book = book.at[cold].set(book[hot] * jitter)
  usage = usage.at[cold].set(usage[hot] / 2.0)
  usage = usage.at[hot].set(usage[hot] / 2.0)
  # Halve the (count-scaled) codeword storage to match the halved counts.
  book = book.at[cold].set(book[cold] / 2.0)
  book = book.at[hot].set(book[hot] / 2.0)
  return {"rng": key, "dictionary": book, "counts": usage}


class Model(nn.Module):
  """ViT VQ-VAE: task-output dict in, task-logit dict out."""

  # --- task i/o spec ---
  inputs: Mapping[str, Sequence[int]]
  outputs: Mapping[str, Sequence[int]]
  # --- backbone geometry ---
  input_size: Sequence[int] = (256, 256)
  patch_size: Sequence[int] = (8, 8)
  width: int = 768
  num_heads: int = 12
  mlp_dim: Optional[int] = None
  enc_depth: int = 6
  dec_depth: int = 6
  posemb: str = "learn"  # or "sincos2d"
  # --- bottleneck / codebook ---
  code_len: int = 256
  dict_size: int = 512
  codeword_dim: Optional[int] = None
  dict_momentum: float = 0.995  # EMA coefficient for codebook stats.
  quantize: bool = True
  statistics_axis_name: Optional[str] = None  # see module docstring
  # Discounted count below which a codeword counts as dead; 0.995**500.
  min_count: float = 0.1
  bottleneck_resize: bool = False
  # --- conditioning & regularization ---
  with_encoder_ctx: bool = False
  with_decoder_ctx: bool = False
  code_dropout: str = "none"
  zero_decoder_seq: bool = False
  dropout: float = 0.0
  rep_size: Union[int, bool] = False
  reinit: Optional[Sequence[str]] = None
  head_zeroinit: bool = True

  def setup(self):
    self.grid_size = np.array(self.input_size) // np.array(self.patch_size)
    n_tokens = np.prod(self.grid_size)
    d_code = self.codeword_dim or self.width

    self.embeddings = {
        k: nn.DenseGeneral(name=f"embedding_{k}",
                           axis=range(-len(shape), 0),
                           features=(self.width,))
        for k, shape in self.inputs.items()}
    head_kw = ({"kernel_init": nn.initializers.zeros}
               if self.head_zeroinit else {})
    self.heads = {
        k: nn.DenseGeneral(name=f"head_{k}", features=shape, **head_kw)
        for k, shape in self.outputs.items()}

    if self.with_encoder_ctx:
      self.stem_conv_ctx_enc = self._ctx_stem("ctx_enc_embedding")
    if self.with_decoder_ctx:
      self.stem_conv_ctx_dec = self._ctx_stem("ctx_dec_embedding")

    self.pos_embedding_encoder = vit.get_posemb(
        self, self.posemb, tuple(self.grid_size), self.width,
        "pos_embedding_encoder")
    self.encoder = vit.Encoder(name="encoder", num_heads=self.num_heads,
                               depth=self.enc_depth, dropout=self.dropout,
                               mlp_dim=self.mlp_dim)

    # Token-count projections of the bottleneck (unused when resizing).
    if not self.bottleneck_resize:
      self.bottleneck_downsample = self.param(
          "bottleneck_downsample", nn.initializers.xavier_uniform(),
          (n_tokens, self.code_len))

    self.dictionary = self.variable(
        "state", "dictionary",
        lambda shape: nn.initializers.normal(
            stddev=1.0 / np.sqrt(self.dict_size))(
                self.make_rng("state"), shape),
        (self.dict_size, d_code))
    self.counts = self.variable(
        "state", "counts", jnp.ones, (self.dict_size,))

    if not self.bottleneck_resize:
      self.bottleneck_upsample = self.param(
          "bottleneck_upsample", nn.initializers.xavier_uniform(),
          (self.code_len, n_tokens))

    self.pos_embedding_decoder = vit.get_posemb(
        self, self.posemb, tuple(self.grid_size), self.width,
        "pos_embedding_decoder")
    self.decoder = vit.Encoder(name="decoder", num_heads=self.num_heads,
                               depth=self.dec_depth, dropout=self.dropout,
                               mlp_dim=self.mlp_dim)
    self.encoder_head = nn.Dense(d_code)
    self.decoder_stem = nn.Dense(self.width)

  def _ctx_stem(self, name):
    return nn.Conv(self.width, self.patch_size, strides=self.patch_size,
                   padding="VALID", name=name)

  def _resize_tokens(self, x, old_hw, new_hw):
    """[B, oh*ow, C] -> [B, nh*nw, C] bilinear token-grid resize."""
    b, _, c = x.shape
    grid = x.reshape(b, *old_hw, c)
    grid = jax.image.resize(grid, (b, *new_hw, c), "linear")
    return grid.reshape(b, -1, c)

  def _code_grid(self):
    side = int(np.round(self.code_len ** 0.5))
    return side, side

  def get_codewords(self):
    """Count-normalized, L2-normalized codebook."""
    e = self.dictionary.value / self.counts.value[:, None]
    return e / jnp.linalg.norm(e, axis=-1, keepdims=True)

  def _track_codebook(self, idx, targets):
    """EMA codebook update + dead-codeword revival; emits health stats."""
    counts = jnp.zeros(self.dict_size, jnp.int32).at[idx].add(1)
    sums = jnp.zeros_like(self.dictionary.value).at[idx].add(
        jax.lax.stop_gradient(targets))
    if self.statistics_axis_name:
      counts = jax.lax.psum(counts, self.statistics_axis_name)
      sums = jax.lax.psum(sums, self.statistics_axis_name)

    stats = {"codebook_max_ratio": jnp.max(counts) / jnp.sum(counts),
             "codebook_zeros_ratio": jnp.mean(counts == 0)}
    return counts, sums, stats

  def _apply_codebook_update(self, counts, sums):
    decay = self.dict_momentum
    state = {"dictionary": self.dictionary.value * decay + sums,
             "counts": self.counts.value * decay + counts,
             "rng": self.make_rng("vqvae")}
    state = jax.lax.while_loop(
        lambda s: jnp.any(s["counts"] < self.min_count),
        split_the_most_frequent_embedding, state)
    self.counts.value = state["counts"]
    self.dictionary.value = state["dictionary"]

  def encode(self, x, *, ctx=None, train=False, update_dict=True):
    aux = {"stem": {k: emb(x[k]) for k, emb in self.embeddings.items()}}
    tokens = sum(aux["stem"].values())

    if self.with_encoder_ctx:
      patches = self.stem_conv_ctx_enc(ctx)
      tokens = tokens + patches.reshape(*tokens.shape[:1], -1,
                                        patches.shape[-1])

    tokens, _ = self.encoder(tokens + self.pos_embedding_encoder,
                             deterministic=not train)

    if self.bottleneck_resize:
      tokens = self._resize_tokens(tokens, tuple(self.grid_size),
                                   self._code_grid())
    else:
      tokens = jnp.einsum("btc,tn->bnc", tokens,
                          self.bottleneck_downsample)

    pre_q = aux["bottleneck"] = jax.nn.standardize(
        self.encoder_head(tokens), axis=-1)
    quantized, idx = quantize(pre_q, self.get_codewords())
    aux["bottleneck_q"] = quantized
    aux["code"] = idx

    if train:
      counts, sums, stats = self._track_codebook(idx, pre_q)
      aux.update(stats)
      if update_dict:
        self._apply_codebook_update(counts, sums)

    if not self.quantize:
      quantized = aux["bottleneck_q"] = pre_q
    return quantized, aux

  def _code_dropout(self, x):
    """Drops a random suffix of the code (or random subset, mode
    "random"), biasing early codes to carry coarse content."""
    importance = jnp.linspace(1.0, 0.0, self.code_len + 2)[1:-1]
    thresholds = jax.random.uniform(self.make_rng("dropout"), x.shape[:1])
    mask = importance[None, :] > thresholds[:, None]
    if self.code_dropout == "random":
      mask = jax.random.permutation(self.make_rng("dropout"), mask,
                                    axis=-1, independent=True)
    return x * mask[:, :, None]

  def decode(self, x, ctx=None, discrete_input=False, train=False):
    if discrete_input:
      x = self.get_codewords()[x]
    if self.zero_decoder_seq:
      x = jnp.zeros_like(x)
    if train and self.code_dropout != "none":
      x = self._code_dropout(x)

    tokens = self.decoder_stem(x)
    if self.bottleneck_resize:
      tokens = self._resize_tokens(tokens, self._code_grid(),
                                   tuple(self.grid_size))
    else:
      tokens = jnp.einsum("bnc,nt->btc", tokens, self.bottleneck_upsample)

    if self.with_decoder_ctx:
      patches = self.stem_conv_ctx_dec(ctx)
      tokens = tokens + patches.reshape(*tokens.shape[:1], -1,
                                        patches.shape[-1])

    tokens, _ = self.decoder(tokens + self.pos_embedding_decoder)
    logits = {k: head(tokens) for k, head in self.heads.items()}
    return logits, {"logits": logits}

  def __call__(self, x, *, ctx=None, train=False, update_dict=True):
    quantized, out_enc = self.encode(x, ctx=ctx, train=train,
                                     update_dict=update_dict)
    logits, out_dec = self.decode(quantized, ctx=ctx, train=train)
    return logits, {**out_enc, **out_dec}


def load(init_params, init_file, model_params=None, dont_load=()):
  """Loads (params, state) from a stage-I checkpoint."""
  del model_params
  import flax.training.checkpoints
  if not init_file.endswith(".npz"):
    raise ValueError("UViM loader currently supports .npz checkpoints; "
                     f"got {init_file!r}")
  ckpt = u.npz_load(init_file)
  tree = flax.training.checkpoints.convert_pre_linen(
      {"params": ckpt["params"], "state": ckpt["state"]})
  params = tree["params"]
  if "Encoder" in params:  # Historical capitalized module names.
    params["encoder"] = params.pop("Encoder")
    params["decoder"] = params.pop("Decoder")
  if init_params is not None:
    params = common.merge_params(params, init_params, dont_load)
  return params, tree["state"]
