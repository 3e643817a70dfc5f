"""ResNet / DCGAN building blocks.

Rebuilds the reference's block library (``blocks.py::resblock`` [U];
pre-activation SN-GAN-style residual blocks, paper §5 architecture
descriptions) as flax modules. Norm/coloring are injected per block via the
code strings from the CLI, exactly as the reference threads its ``norm`` /
``coloring`` arguments [U].

TPU-first choices: NHWC layout throughout; nearest-neighbor upsample as
reshape+broadcast; 2x2 average-pool downsample as reshape+mean — both are
layout-preserving and fuse into the adjacent convs under XLA.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from wcgan_tpu.models import layers as L


def _disc_conv(block, features, kernel, name, strides=None):
  """THE spectral/plain conv switch for discriminator blocks — one
  definition for DiscResBlock, DiscOptimizedBlock, and DCGANDiscBlock
  (three hand-synced copies previously; models review r3)."""
  kw = dict(features=features, kernel_size=kernel, padding="SAME",
            name=name)
  if strides is not None:
    kw["strides"] = strides
  if block.spectral:
    return L.SNConv(sn_iters=block.sn_iters, fully_diff=block.fully_diff,
                    conv_singular=block.conv_singular, **kw)
  return L.Conv(**kw)


class GenResBlock(nn.Module):
  """Generator residual block: norm→color→ReLU→(up)→conv ×2 + shortcut.

  Reference: ``blocks.py::resblock(resample="UP") `` [U]. The shortcut is
  upsampled, and passed through a learned 1×1 conv whenever the block
  upsamples OR changes channels (SN-GAN convention — so every upsampling
  block has ``conv_sc``, including equal-width ones)."""

  filters: int
  upsample: bool = True
  norm: str = "d"
  coloring: str = "uconv"
  num_classes: int = 0
  filters_emb: int = 10
  ns_iters: int = 15
  ns_method: str = "newton_schulz"
  momentum: float = 0.99
  ns_scaling: str = "trace"
  axis_name: Optional[str] = None
  dtype: Optional[jnp.dtype] = None

  @nn.compact
  def __call__(self, x: jax.Array, labels: Optional[jax.Array] = None,
               train: bool = True) -> jax.Array:
    def norm_color(name):
      return L.NormColor(
          norm=self.norm, coloring=self.coloring,
          num_classes=self.num_classes, filters_emb=self.filters_emb,
          ns_iters=self.ns_iters, method=self.ns_method,
          momentum=self.momentum, ns_scaling=self.ns_scaling,
          axis_name=self.axis_name, name=name)

    h = norm_color("nc1")(x, labels, train=train)
    h = nn.relu(h)
    if self.upsample:
      h = L.upsample_nearest(h)
    h = nn.Conv(self.filters, (3, 3), padding="SAME",
                dtype=self.dtype, name="conv1")(h)
    h = norm_color("nc2")(h, labels, train=train)
    h = nn.relu(h)
    h = nn.Conv(self.filters, (3, 3), padding="SAME",
                dtype=self.dtype, name="conv2")(h)

    sc = x
    if self.upsample:
      sc = L.upsample_nearest(sc)
    if self.upsample or sc.shape[-1] != self.filters:
      # SN-GAN/reference convention: learned 1x1 shortcut whenever the
      # block RESAMPLES or changes channels (mirrors DiscResBlock below;
      # equal-channel upsampling blocks previously skipped it — a parity
      # deviation at the headline CIFAR widths, models review r3).
      sc = nn.Conv(self.filters, (1, 1), padding="SAME",
                   dtype=self.dtype, name="conv_sc")(sc)
    return h + sc


class DiscResBlock(nn.Module):
  """Discriminator residual block: ReLU→conv→ReLU→conv→(down) + shortcut.

  Reference: ``blocks.py::resblock(resample="DOWN")`` with SN convs
  (``gan/spectral_normalized_layers.py`` [U]). Optional norm in D mirrors
  ``--discriminator_norm`` [U]."""

  filters: int
  downsample: bool = True
  spectral: bool = True
  sn_iters: int = 1
  fully_diff: bool = False
  conv_singular: bool = False
  norm: str = "n"
  coloring: str = "n"
  num_classes: int = 0
  filters_emb: int = 10
  ns_iters: int = 15
  ns_method: str = "newton_schulz"
  momentum: float = 0.99
  ns_scaling: str = "trace"
  axis_name: Optional[str] = None

  def _conv(self, features, kernel, name):
    return _disc_conv(self, features, kernel, name)

  @nn.compact
  def __call__(self, x: jax.Array, labels: Optional[jax.Array] = None,
               train: bool = True, update_sn: bool = False) -> jax.Array:
    def norm_color(name):
      return L.NormColor(
          norm=self.norm, coloring=self.coloring,
          num_classes=self.num_classes, filters_emb=self.filters_emb,
          ns_iters=self.ns_iters, method=self.ns_method,
          momentum=self.momentum, ns_scaling=self.ns_scaling,
          axis_name=self.axis_name, name=name)

    h = x
    if self.norm != "n" or self.coloring != "n":
      h = norm_color("nc1")(h, labels, train=train)
    h = nn.relu(h)
    h = self._conv(self.filters, (3, 3), "conv1")(h, update_sn=update_sn)
    if self.norm != "n" or self.coloring != "n":
      h = norm_color("nc2")(h, labels, train=train)
    h = nn.relu(h)
    h = self._conv(self.filters, (3, 3), "conv2")(h, update_sn=update_sn)
    if self.downsample:
      h = L.downsample_avg(h)

    sc = x
    if sc.shape[-1] != self.filters or self.downsample:
      sc = self._conv(self.filters, (1, 1), "conv_sc")(sc,
                                                       update_sn=update_sn)
      if self.downsample:
        sc = L.downsample_avg(sc)
    return h + sc


class DiscOptimizedBlock(nn.Module):
  """First D block on raw pixels: conv→ReLU→conv→down; shortcut
  down→1×1conv (SN-GAN's 'optimized block' — no pre-activation on the
  image input)."""

  filters: int
  spectral: bool = True
  sn_iters: int = 1
  fully_diff: bool = False
  conv_singular: bool = False

  def _conv(self, features, kernel, name):
    return _disc_conv(self, features, kernel, name)

  @nn.compact
  def __call__(self, x: jax.Array, update_sn: bool = False) -> jax.Array:
    h = self._conv(self.filters, (3, 3), "conv1")(x, update_sn=update_sn)
    h = nn.relu(h)
    h = self._conv(self.filters, (3, 3), "conv2")(h, update_sn=update_sn)
    h = L.downsample_avg(h)
    sc = L.downsample_avg(x)
    sc = self._conv(self.filters, (1, 1), "conv_sc")(sc, update_sn=update_sn)
    return h + sc


class DCGANGenBlock(nn.Module):
  """DCGAN generator block: norm→color→ReLU→4×4 stride-2 transposed conv
  (the reference's DCGAN arch [U])."""

  filters: int
  norm: str = "d"
  coloring: str = "uconv"
  num_classes: int = 0
  filters_emb: int = 10
  ns_iters: int = 15
  ns_method: str = "newton_schulz"
  momentum: float = 0.99
  ns_scaling: str = "trace"
  axis_name: Optional[str] = None
  dtype: Optional[jnp.dtype] = None

  @nn.compact
  def __call__(self, x: jax.Array, labels: Optional[jax.Array] = None,
               train: bool = True) -> jax.Array:
    h = L.NormColor(
        norm=self.norm, coloring=self.coloring,
        num_classes=self.num_classes, filters_emb=self.filters_emb,
        ns_iters=self.ns_iters, method=self.ns_method,
        momentum=self.momentum, ns_scaling=self.ns_scaling,
        axis_name=self.axis_name, name="nc")(x, labels, train=train)
    h = nn.relu(h)
    return nn.ConvTranspose(self.filters, (4, 4), strides=(2, 2),
                            padding="SAME", dtype=self.dtype,
                            name="deconv")(h)


class DCGANDiscBlock(nn.Module):
  """DCGAN discriminator block: 4×4 stride-2 (SN)conv → LeakyReLU(0.1)."""

  filters: int
  spectral: bool = True
  sn_iters: int = 1
  fully_diff: bool = False
  conv_singular: bool = False

  @nn.compact
  def __call__(self, x: jax.Array, update_sn: bool = False) -> jax.Array:
    h = _disc_conv(self, self.filters, (4, 4), "conv",
                   strides=(2, 2))(x, update_sn=update_sn)
    return nn.leaky_relu(h, negative_slope=0.1)
