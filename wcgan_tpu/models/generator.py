"""Generator builders: ResNet (SN-GAN style) and DCGAN, WC-normalized.

Rebuilds ``generator.py::make_generator`` [U]: z∈R^128 (N(0,1))
[+ embedded/one-hot class] → Dense → base_res×base_res×ch → up-blocks →
final norm+coloring → ReLU → 3×3 conv → tanh. Per-block norm / coloring
codes come from the CLI exactly as in the reference (``--generator_block_norm``
/ ``--generator_block_coloring`` / last-layer variants [U]).

Resolutions: CIFAR 32 = 4·2³ (3 blocks), STL-10 48 = 6·2³ (3 blocks),
Tiny-ImageNet / ImageNet 64 = 4·2⁴ (4 blocks).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from wcgan_tpu.models import blocks as B
from wcgan_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
  """Static generator hyperparameters (the make_generator arg surface [U])."""

  arch: str = "res"                    # 'res' | 'dcgan'
  z_dim: int = 128
  resolution: int = 32
  output_channels: int = 3
  filters: Tuple[int, ...] = (256, 256, 256)
  base_resolution: int = 4
  block_norm: str = "d"
  block_coloring: str = "uconv"
  last_norm: str = "d"
  last_coloring: str = "uconv"
  num_classes: int = 0                 # 0 => unconditional
  filters_emb: int = 10
  concat_cls: bool = False             # --generator_concat_cls [U]
  ns_iters: int = 15
  ns_method: str = "newton_schulz"
  ns_scaling: str = "trace"            # NS convergence normalization:
                                       # 'trace' (IterNorm parity) or
                                       # 'fro' (measured 10-30x lower
                                       # residual at high conditioning,
                                       # same cost — ops/whiten.py)
  wc_momentum: float = 0.99            # EMA momentum of the WC/BN running
                                       # stats (the Keras BN default [U];
                                       # lower = fresher running stats —
                                       # see the d_fake_stats=running
                                       # lag analysis, docs/SOAK.md r4)
  axis_name: Optional[str] = None
  dtype: str = "float32"               # compute dtype: 'float32'|'bfloat16'
  remat: bool = False                  # rematerialize blocks in backward
                                       # (memory for FLOPs; big configs)

  def __post_init__(self):
    expected = self.base_resolution * 2 ** len(self.filters)
    if expected != self.resolution:
      raise ValueError(
          f"base_resolution {self.base_resolution} x 2^{len(self.filters)} "
          f"blocks = {expected}, but resolution is {self.resolution}")


class Generator(nn.Module):
  """Unified generator module; `cfg.arch` picks ResNet or DCGAN."""

  cfg: GeneratorConfig

  @nn.compact
  def __call__(self, z: jax.Array, labels: Optional[jax.Array] = None,
               train: bool = True) -> jax.Array:
    cfg = self.cfg
    conditional = cfg.num_classes > 0
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    if conditional and labels is None:
      raise ValueError("conditional generator needs labels")
    cond_labels = labels

    h = z.astype(dtype)
    if conditional and cfg.concat_cls:
      onehot = jax.nn.one_hot(labels, cfg.num_classes, dtype=dtype)
      h = jnp.concatenate([h, onehot], axis=-1)

    br = cfg.base_resolution
    h = nn.Dense(br * br * cfg.filters[0], dtype=dtype, name="fc_in")(h)
    h = h.reshape(h.shape[0], br, br, cfg.filters[0])

    block_cls = B.GenResBlock if cfg.arch == "res" else B.DCGANGenBlock
    if cfg.remat:
      # static_argnums counts the module as arg 0; train is positional
      # arg 3 (remat cannot mark kwargs static).
      block_cls = nn.remat(block_cls, static_argnums=(3,))
    for i, f in enumerate(cfg.filters):
      kwargs = dict(
          filters=f, norm=cfg.block_norm, coloring=cfg.block_coloring,
          num_classes=cfg.num_classes, filters_emb=cfg.filters_emb,
          ns_iters=cfg.ns_iters, ns_method=cfg.ns_method,
          momentum=cfg.wc_momentum, ns_scaling=cfg.ns_scaling,
          axis_name=cfg.axis_name, dtype=dtype, name=f"block{i}")
      if cfg.arch == "res":
        kwargs["upsample"] = True
      h = block_cls(**kwargs)(h, cond_labels, train)

    h = L.NormColor(
        norm=cfg.last_norm, coloring=cfg.last_coloring,
        num_classes=cfg.num_classes, filters_emb=cfg.filters_emb,
        ns_iters=cfg.ns_iters, method=cfg.ns_method,
        momentum=cfg.wc_momentum, ns_scaling=cfg.ns_scaling,
        axis_name=cfg.axis_name, name="nc_out")(h, cond_labels, train=train)
    h = nn.relu(h)
    h = nn.Conv(cfg.output_channels, (3, 3), padding="SAME",
                dtype=dtype, name="conv_out")(h)
    return jnp.tanh(h.astype(jnp.float32))


def make_generator(cfg: GeneratorConfig) -> Generator:
  """Factory mirroring the reference's ``make_generator(...)`` [U]."""
  return Generator(cfg=cfg)


def preset_filters(arch: str, resolution: int) -> Sequence[int]:
  """Per-dataset default G widths (paper §5 architectures)."""
  if arch == "dcgan":
    return {16: (128, 64), 32: (256, 128, 64), 48: (256, 128, 64),
            64: (512, 256, 128, 64)}[resolution]
  return {16: (128, 128), 32: (256, 256, 256), 48: (512, 256, 128),
          64: (512, 256, 128, 64)}[resolution]
