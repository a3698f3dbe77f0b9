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
  affinity = 2 * jnp.einsum("...d,kd->...k", x, e)
  idx = jnp.argmax(affinity - jnp.sum(e * e, axis=-1), axis=-1)
  straight_through = x + jax.lax.stop_gradient(e[idx] - x)
  return straight_through, idx


def split_the_most_frequent_embedding(state):
  """Replaces the least-used codeword with a perturbed copy of the most
  used one, halving its counts (dead-codebook revival)."""
  book, usage, key = state["dictionary"], state["counts"], state["rng"]
  key, subkey = jax.random.split(key)
  hot = jnp.argmax(usage)
  cold = jnp.argmin(usage)

  jitter = jax.random.uniform(subkey, (book.shape[1],), jnp.float32,
                              1.0 - PERTURB, 1.0 + PERTURB)
  # Split: the (count-scaled) codeword storage halves along with the
  # counts, so the count-normalized codeword survives the split intact.
  half_hot = book[hot] / 2.0
  book = book.at[cold].set(half_hot * jitter).at[hot].set(half_hot)
  usage = usage.at[cold].set(usage[hot] / 2.0).at[hot].divide(2.0)
  return {"rng": key, "dictionary": book, "counts": usage}


class Model(nn.Module):
  """ViT VQ-VAE: task-output dict in, task-logit dict out."""

  # --- task i/o spec ---
  inputs: Mapping[str, Sequence[int]]
  outputs: Mapping[str, Sequence[int]]
  # --- backbone geometry ---
  width: int = 768
  enc_depth: int = 6
  dec_depth: int = 6
  mlp_dim: Optional[int] = None
  num_heads: int = 12
  posemb: str = "learn"  # or "sincos2d"
  input_size: Sequence[int] = (256, 256)
  patch_size: Sequence[int] = (8, 8)
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

  def _trunk(self, side, depth):
    posemb = vit.get_posemb(self, self.posemb, tuple(self.grid_size),
                            self.width, f"pos_embedding_{side}")
    body = vit.Encoder(name=side, num_heads=self.num_heads, depth=depth,
                       dropout=self.dropout, mlp_dim=self.mlp_dim)
    return posemb, body

  def _ctx_stem(self, name):
    return nn.Conv(self.width, self.patch_size, strides=self.patch_size,
                   padding="VALID", name=name)

  def setup(self):
    self.grid_size = np.array(self.input_size) // np.array(self.patch_size)
    d_code = self.codeword_dim or self.width

    # Per-task stems and readouts.
    head_kw = ({"kernel_init": nn.initializers.zeros}
               if self.head_zeroinit else {})
    self.embeddings = {
        k: nn.DenseGeneral(name=f"embedding_{k}",
                           axis=range(-len(shape), 0),
                           features=(self.width,))
        for k, shape in self.inputs.items()}
    self.heads = {
        k: nn.DenseGeneral(name=f"head_{k}", features=shape, **head_kw)
        for k, shape in self.outputs.items()}
    if self.with_encoder_ctx:
      self.stem_conv_ctx_enc = self._ctx_stem("ctx_enc_embedding")
    if self.with_decoder_ctx:
      self.stem_conv_ctx_dec = self._ctx_stem("ctx_dec_embedding")

    # Trunks. NOTE: param creation order here is load-bearing only for rng
    # streams at init, not for the checkpoint tree (names pin the tree).
    self.pos_embedding_encoder, self.encoder = self._trunk(
        "encoder", self.enc_depth)
    if not self.bottleneck_resize:
      self.bottleneck_downsample = self.param(
          "bottleneck_downsample", nn.initializers.xavier_uniform(),
          (int(np.prod(self.grid_size)), self.code_len))

    # Codebook state: count-scaled codeword sums + discounted counts.
    def init_book(shape):
      std = 1.0 / np.sqrt(self.dict_size)
      return nn.initializers.normal(stddev=std)(self.make_rng("state"),
                                                shape)
    self.dictionary = self.variable("state", "dictionary", init_book,
                                    (self.dict_size, d_code))
    self.counts = self.variable("state", "counts", jnp.ones,
                                (self.dict_size,))

    if not self.bottleneck_resize:
      self.bottleneck_upsample = self.param(
          "bottleneck_upsample", nn.initializers.xavier_uniform(),
          (self.code_len, int(np.prod(self.grid_size))))
    self.pos_embedding_decoder, self.decoder = self._trunk(
        "decoder", self.dec_depth)
    self.encoder_head = nn.Dense(d_code)
    self.decoder_stem = nn.Dense(self.width)

  # --- bottleneck plumbing -------------------------------------------------

  def _code_grid(self):
    side = int(np.round(self.code_len ** 0.5))
    return side, side

  def _bottleneck(self, tokens, *, down):
    """Patch-grid tokens <-> code_len tokens (learned matmul or resize)."""
    if not self.bottleneck_resize:
      mat = self.bottleneck_downsample if down else self.bottleneck_upsample
      return jnp.einsum("bsc,sd->bdc", tokens, mat)
    src, dst = tuple(self.grid_size), self._code_grid()
    if not down:
      src, dst = dst, src
    b, _, c = tokens.shape
    grid = jax.image.resize(tokens.reshape(b, *src, c), (b, *dst, c),
                            "linear")
    return grid.reshape(b, -1, c)

  # --- codebook maintenance ------------------------------------------------

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
      counts, sums = (jax.lax.psum(t, self.statistics_axis_name)
                      for t in (counts, sums))

    stats = {"codebook_max_ratio": jnp.max(counts) / jnp.sum(counts),
             "codebook_zeros_ratio": jnp.mean(counts == 0)}
    return counts, sums, stats

  def _apply_codebook_update(self, counts, sums):
    decay = self.dict_momentum
    healthy = jax.lax.while_loop(
        lambda s: jnp.any(s["counts"] < self.min_count),
        split_the_most_frequent_embedding,
        {"dictionary": self.dictionary.value * decay + sums,
         "counts": self.counts.value * decay + counts,
         "rng": self.make_rng("vqvae")})
    self.counts.value = healthy["counts"]
    self.dictionary.value = healthy["dictionary"]

  # --- encode / decode -----------------------------------------------------

  def encode(self, x, *, ctx=None, train=False, update_dict=True):
    aux = {"stem": {k: emb(x[k]) for k, emb in self.embeddings.items()}}
    tokens = sum(aux["stem"].values())

    if self.with_encoder_ctx:
      patches = self.stem_conv_ctx_enc(ctx)
      tokens += patches.reshape(tokens.shape[0], -1, patches.shape[-1])

    tokens, _ = self.encoder(tokens + self.pos_embedding_encoder,
                             deterministic=not train)
    tokens = self._bottleneck(tokens, down=True)

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

    tokens = self._bottleneck(self.decoder_stem(x), down=False)

    if self.with_decoder_ctx:
      patches = self.stem_conv_ctx_dec(ctx)
      tokens += patches.reshape(tokens.shape[0], -1, patches.shape[-1])

    tokens, _ = self.decoder(tokens + self.pos_embedding_decoder)
    logits = {k: head(tokens) for k, head in self.heads.items()}
    return logits, {"logits": logits}

  def __call__(self, x, *, ctx=None, train=False, update_dict=True):
    quantized, out_enc = self.encode(x, ctx=ctx, train=train,
                                     update_dict=update_dict)
    logits, out_dec = self.decode(quantized, ctx=ctx, train=train)
    return logits, {**out_enc, **out_dec}
