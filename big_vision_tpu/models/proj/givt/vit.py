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


def load(init_params: Any, init_file: str, model_params: Any = None,
         dont_load: Sequence[str] = ()) -> Any:
  del model_params
  restored = u.load_params(init_file)
  if init_params is None:
    return restored
  return common.merge_params(restored, init_params, dont_load)


def _unpatchify(flat, grid_hw, patch_hw):
  """[B, h*w, p*q*c] -> [B, h*p, w*q, c] with one reshape+transpose pair
  (XLA folds this into the head matmul's output layout)."""
  b = flat.shape[0]
  (h, w), (p, q) = grid_hw, patch_hw
  c = flat.shape[-1] // (p * q)
  return (flat.reshape(b, h, w, p, q, c)
          .transpose(0, 1, 3, 2, 4, 5)
          .reshape(b, h * p, w * q, c))


class Model(vae.Model):
  """ViT VAE: encode -> (mu, logvar) over code_len tokens; decode back."""

  # Transformer geometry.
  width: int = 768
  enc_depth: int = 6
  dec_depth: int = 6
  num_heads: int = 12
  mlp_dim: Optional[int] = None
  posemb: str = "learn"  # or "sincos2d"
  dropout: float = 0.0
  # Patch grid geometry.
  input_size: Sequence[int] = (256, 256)
  patch_size: Sequence[int] = (16, 16)
  # Latent geometry: either a learned n_tokens<->code_len projection pair
  # or a parameter-free bilinear grid resize.
  code_len: int = 256
  bottleneck_resize: bool = False
  # Readout.
  head_zeroinit: bool = True
  # Categorical channel spec: {name: (input_channel, num_classes)}.
  inout_specs: Optional[Mapping[str, tuple]] = None
  remat_policy: str = "nothing_saveable"
  scan: bool = False

  def _trunk(self, side, depth):
    """One ViT trunk (encoder or decoder) + its grid posemb, by name."""
    posemb = vit.get_posemb(self, self.posemb, tuple(self.grid_size),
                            self.width, f"pos_embedding_{side}")
    body = vit.Encoder(name=side, depth=depth, num_heads=self.num_heads,
                       mlp_dim=self.mlp_dim, dropout=self.dropout,
                       remat_policy=self.remat_policy, scan=self.scan)
    return posemb, body

  def setup(self):
    self.grid_size = np.asarray(
        [s // p for s, p in zip(self.input_size, self.patch_size)])

    self.embedding = vit.PatchEmbed(self.width, tuple(self.patch_size),
                                    name="embedding")
    self.pos_embedding_encoder, self.encoder = self._trunk(
        "encoder", self.enc_depth)
    self.pos_embedding_decoder, self.decoder = self._trunk(
        "decoder", self.dec_depth)

    if not self.bottleneck_resize:
      n_tokens = int(np.prod(self.grid_size))
      init = nn.initializers.xavier_uniform()
      self.bottleneck_downsample = self.param(
          "bottleneck_downsample", init, (n_tokens, self.code_len))
      self.bottleneck_upsample = self.param(
          "bottleneck_upsample", init, (self.code_len, n_tokens))

    # Gaussian posterior head (mu ++ logvar) and pixel/logit readout.
    self.encoder_head = nn.Dense(2 * (self.codeword_dim or self.width))
    self.decoder_stem = nn.Dense(self.width)
    out_channels = 3 if self.inout_specs is None else sum(
        n for _, n in self.inout_specs.values())
    head_kw = dict(kernel_init=nn.initializers.zeros) \
        if self.head_zeroinit else {}
    self.head = nn.Dense(out_channels * np.prod(self.patch_size),
                         name="decoder_head", **head_kw)

  def _latent_grid(self):
    side = int(np.round(self.code_len ** 0.5))
    return side, side

  def _bottleneck(self, tokens, *, down):
    """Patch-grid tokens <-> code_len latent tokens, either direction."""
    if self.bottleneck_resize:
      src, dst = tuple(self.grid_size), self._latent_grid()
      if not down:
        src, dst = dst, src
      grid = einops.rearrange(tokens, "b (h w) c -> b h w c",
                              h=src[0], w=src[1])
      grid = jax.image.resize(
          grid, (grid.shape[0], *dst, grid.shape[-1]), "linear")
      return einops.rearrange(grid, "b h w c -> b (h w) c")
    mat = self.bottleneck_downsample if down else self.bottleneck_upsample
    return jnp.einsum("bsc,sd->bdc", tokens, mat)

  def encode(self, x, *, train=False):
    if self.inout_specs is not None:
      # Categorical input channels -> concatenated one-hot planes.
      x = jnp.concatenate(
          [nn.one_hot(x[..., ch].astype(jnp.int32), n)
           for ch, n in self.inout_specs.values()], axis=-1)
    patches = einops.rearrange(self.embedding(x), "b h w c -> b (h w) c")
    tokens, _ = self.encoder(patches + self.pos_embedding_encoder,
                             deterministic=not train)
    moments = self.encoder_head(self._bottleneck(tokens, down=True))
    mu, logvar = jnp.split(moments, 2, axis=-1)
    return mu, logvar

  def decode(self, x, train=False):
    tokens = self._bottleneck(self.decoder_stem(x), down=False)
    tokens, _ = self.decoder(tokens + self.pos_embedding_decoder,
                             deterministic=not train)
    dense = _unpatchify(self.head(tokens), self.grid_size, self.patch_size)

    if self.inout_specs is None:
      return jnp.clip(dense, -1.0, 1.0)
    outputs, lo = {}, 0
    for name, (_, n) in self.inout_specs.items():
      outputs[name] = dense[..., lo:lo + n]
      lo += n
    return outputs
