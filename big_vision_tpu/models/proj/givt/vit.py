"""ViT-based Gaussian VAE for GIVT (UViM-style stage-I model).

Behavior parity: reference models/proj/givt/vit.py — a ViT encoder/decoder
pair with a learned (or bilinear-resize) bottleneck mapping between the
patch grid and `code_len` latent tokens; optional `inout_specs` for
categorical inputs/outputs (e.g. panoptic semantics+instances channels).

The patch stem is the shared matmul patchify (vit.PatchEmbed, same param
tree as the nn.Conv it replaces) so the stem runs on the MXU at full tilt.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence

import einops
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import big_vision_tpu.utils as u
from big_vision_tpu.models import common, vit
from big_vision_tpu.models.proj.givt import vae


class Model(vae.Model):
  """ViT VAE: encode -> (mu, logvar) over code_len tokens; decode back."""

  # Patch grid geometry.
  input_size: Sequence[int] = (256, 256)
  patch_size: Sequence[int] = (16, 16)
  # Latent geometry: either a learned n_tokens<->code_len projection pair
  # or a parameter-free bilinear grid resize.
  code_len: int = 256
  bottleneck_resize: bool = False
  # Transformer geometry.
  enc_depth: int = 6
  dec_depth: int = 6
  width: int = 768
  mlp_dim: Optional[int] = None
  num_heads: int = 12
  posemb: str = "learn"  # or "sincos2d"
  head_zeroinit: bool = True
  dropout: float = 0.0
  # Categorical channel spec: {name: (input_channel, num_classes)}.
  inout_specs: Optional[Mapping[str, tuple]] = None
  remat_policy: str = "nothing_saveable"
  scan: bool = False

  def setup(self):
    self.grid_size = np.asarray(
        [s // p for s, p in zip(self.input_size, self.patch_size)])
    n_tokens = int(np.prod(self.grid_size))

    self.embedding = vit.PatchEmbed(self.width, tuple(self.patch_size),
                                    name="embedding")

    body_kw = dict(num_heads=self.num_heads, dropout=self.dropout,
                   remat_policy=self.remat_policy, scan=self.scan,
                   mlp_dim=self.mlp_dim)
    self.pos_embedding_encoder = vit.get_posemb(
        self, self.posemb, tuple(self.grid_size), self.width,
        "pos_embedding_encoder")
    self.encoder = vit.Encoder(name="encoder", depth=self.enc_depth,
                               **body_kw)

    if not self.bottleneck_resize:
      mk = lambda nm, shape: self.param(
          nm, nn.initializers.xavier_uniform(), shape)
      self.bottleneck_downsample = mk(
          "bottleneck_downsample", (n_tokens, self.code_len))
      self.bottleneck_upsample = mk(
          "bottleneck_upsample", (self.code_len, n_tokens))

    self.pos_embedding_decoder = vit.get_posemb(
        self, self.posemb, tuple(self.grid_size), self.width,
        "pos_embedding_decoder")
    self.decoder = vit.Encoder(name="decoder", depth=self.dec_depth,
                               **body_kw)

    # Gaussian posterior head (mu ++ logvar) and pixel/logit readout.
    moment_dim = 2 * (self.codeword_dim or self.width)
    self.encoder_head = nn.Dense(moment_dim)
    self.decoder_stem = nn.Dense(self.width)
    if self.inout_specs is not None:
      out_channels = sum(n for _, n in self.inout_specs.values())
    else:
      out_channels = 3
    head_kw = {}
    if self.head_zeroinit:
      head_kw["kernel_init"] = nn.initializers.zeros
    self.head = nn.Dense(out_channels * np.prod(self.patch_size),
                         name="decoder_head", **head_kw)

  def _resize_grid(self, tokens, old_hw, new_hw):
    """Bilinear resize of a flattened token grid."""
    grid = einops.rearrange(tokens, "b (h w) c -> b h w c",
                            h=old_hw[0], w=old_hw[1])
    grid = jax.image.resize(grid, (grid.shape[0], *new_hw, grid.shape[-1]),
                            "linear")
    return einops.rearrange(grid, "b h w c -> b (h w) c")

  def _latent_grid(self):
    side = int(np.round(self.code_len ** 0.5))
    return side, side

  def encode(self, x, *, train=False):
    if self.inout_specs is not None:
      onehots = [nn.one_hot(x[..., channel].astype(jnp.int32), n)
                 for channel, n in self.inout_specs.values()]
      x = jnp.concatenate(onehots, axis=-1)
    patches = einops.rearrange(self.embedding(x), "b h w c -> b (h w) c")
    tokens, _ = self.encoder(patches + self.pos_embedding_encoder,
                             deterministic=not train)

    if self.bottleneck_resize:
      tokens = self._resize_grid(tokens, tuple(self.grid_size),
                                 self._latent_grid())
    else:
      tokens = jnp.einsum("btc,tn->bnc", tokens,
                          self.bottleneck_downsample)

    moments = self.encoder_head(tokens)
    return jnp.split(moments, 2, axis=-1)  # (mu, logvar)

  def decode(self, x, train=False):
    tokens = self.decoder_stem(x)
    if self.bottleneck_resize:
      tokens = self._resize_grid(tokens, self._latent_grid(),
                                 tuple(self.grid_size))
    else:
      tokens = jnp.einsum("bnc,nt->btc", tokens, self.bottleneck_upsample)

    tokens, _ = self.decoder(tokens + self.pos_embedding_decoder,
                             deterministic=not train)
    # Un-patchify [B, h*w, p*q*c] -> [B, h*p, w*q, c] with one reshape +
    # transpose pair (XLA folds this into the head matmul's output layout).
    flat = self.head(tokens)
    (h, w), (p, q) = self.grid_size, self.patch_size
    c = flat.shape[-1] // (p * q)
    dense = flat.reshape(flat.shape[0], h, w, p, q, c)
    dense = dense.transpose(0, 1, 3, 2, 4, 5).reshape(
        flat.shape[0], h * p, w * q, c)

    if self.inout_specs is None:
      return jnp.clip(dense, -1.0, 1.0)
    outputs, lo = {}, 0
    for name, (_, n) in self.inout_specs.items():
      outputs[name] = dense[..., lo:lo + n]
      lo += n
    return outputs


def load(init_params: Any, init_file: str, model_params: Any = None,
         dont_load: Sequence[str] = ()) -> Any:
  del model_params
  restored = u.load_params(init_file)
  if init_params is None:
    return restored
  return common.merge_params(restored, init_params, dont_load)
