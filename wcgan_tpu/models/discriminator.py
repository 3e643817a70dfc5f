"""Discriminator builders: SN-GAN ResNet and DCGAN, projection-D, AC head.

Rebuilds ``discriminator.py::make_discriminator`` [U]: spectral-normalized
down-resblocks → ReLU → global sum pool → SN dense → scalar score; optional
class projection via an SN embedding inner product (projection
discriminator, Miyato & Koyama '18 — ``gan/projective_gan.py`` routes labels
here [U]) and an optional AC-GAN auxiliary classifier head
(``gan/ac_gan.py`` [U]). Whitening in D is available via ``norm``
(``--discriminator_norm`` [U]).
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
class DiscriminatorConfig:
  """Static discriminator hyperparameters (make_discriminator surface [U])."""

  arch: str = "res"                    # 'res' | 'dcgan'
  resolution: int = 32
  input_channels: int = 3
  filters: Tuple[int, ...] = (128, 128, 128, 128)
  downsample: Tuple[bool, ...] = (True, True, False, False)
  spectral: bool = True
  sn_iters: int = 1                    # --spectral_iterations [U]
  fully_diff: bool = False             # --fully_diff_spectral [U]
  conv_singular: bool = False          # --conv_singular [U]
  norm: str = "n"                      # --discriminator_norm [U]
  coloring: str = "n"
  num_classes: int = 0
  filters_emb: int = 10
  projection: bool = False             # projection-D (PROJECTIVE gan type)
  ac_gan: bool = False                 # AC-GAN aux classifier head
  ns_iters: int = 15
  ns_method: str = "newton_schulz"     # --whitening_method [U]
  wc_momentum: float = 0.99            # EMA momentum of WC/BN running stats
  ns_scaling: str = "trace"            # NS convergence normalization
  axis_name: Optional[str] = None
  dtype: str = "float32"
  remat: bool = False

  def __post_init__(self):
    if len(self.downsample) != len(self.filters):
      raise ValueError("downsample and filters must align per block")
    if self.arch == "res" and self.downsample and not self.downsample[0]:
      # Block 0 is the SN-GAN optimized block, which ALWAYS downsamples;
      # honoring downsample[0]=False silently was impossible, so reject
      # it loudly (models review r3).
      raise ValueError("downsample[0] must be True: the first res block "
                       "(optimized block) always downsamples")
    if self.arch == "dcgan" and (self.norm != "n" or self.coloring != "n"):
      # The DCGAN D path has no norm/coloring insertion points (stride-2
      # SN convs + LeakyReLU only, per the reference arch [U]); dropping
      # the request silently would record the wrong experiment. ``remat``
      # is deliberately NOT rejected: it is a numerics-neutral memory
      # knob, and the CLI shares one --remat flag with the generator
      # (which supports it for both archs) — rejecting it here broke
      # ``--arch dcgan --remat`` (review r3). The dcgan D simply has
      # nothing to rematerialize; the flag is a no-op for it.
      raise ValueError("discriminator norm/coloring are not supported "
                       "for the dcgan arch")


class Discriminator(nn.Module):
  """Unified discriminator; returns (scores, class_logits_or_None).

  scores: (N,) raw pre-sigmoid critic outputs; class_logits: (N, K) when
  ``cfg.ac_gan`` else None."""

  cfg: DiscriminatorConfig

  @nn.compact
  def __call__(self, x: jax.Array, labels: Optional[jax.Array] = None,
               train: bool = True, update_sn: bool = False
               ) -> Tuple[jax.Array, Optional[jax.Array]]:
    cfg = self.cfg
    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    h = x.astype(dtype)
    sn_kwargs = dict(spectral=cfg.spectral, sn_iters=cfg.sn_iters,
                     fully_diff=cfg.fully_diff,
                     conv_singular=cfg.conv_singular)

    res_block_cls = B.DiscResBlock
    if cfg.remat:
      # module is arg 0; train and update_sn are positional args 3, 4.
      res_block_cls = nn.remat(B.DiscResBlock, static_argnums=(3, 4))
    if cfg.arch == "res":
      h = B.DiscOptimizedBlock(filters=cfg.filters[0], **sn_kwargs,
                               name="block0")(h, update_sn=update_sn)
      for i, (f, down) in enumerate(
          zip(cfg.filters[1:], cfg.downsample[1:]), start=1):
        h = res_block_cls(
            filters=f, downsample=down, norm=cfg.norm,
            coloring=cfg.coloring, num_classes=cfg.num_classes,
            filters_emb=cfg.filters_emb, ns_iters=cfg.ns_iters,
            ns_method=cfg.ns_method, momentum=cfg.wc_momentum,
            ns_scaling=cfg.ns_scaling,
            axis_name=cfg.axis_name, **sn_kwargs,
            name=f"block{i}")(h, labels, train, update_sn)
      h = nn.relu(h)
      feat = L.global_sum_pool(h).astype(jnp.float32)
    else:  # dcgan
      for i, f in enumerate(cfg.filters):
        h = B.DCGANDiscBlock(filters=f, **sn_kwargs,
                             name=f"block{i}")(h, update_sn=update_sn)
      feat = h.reshape(h.shape[0], -1).astype(jnp.float32)

    dense_cls = L.SNDense if cfg.spectral else L.Dense
    head_kwargs = (dict(sn_iters=cfg.sn_iters, fully_diff=cfg.fully_diff)
                   if cfg.spectral else {})
    score = dense_cls(features=1, **head_kwargs,
                      name="fc_out")(feat, update_sn=update_sn)[:, 0]

    if cfg.projection:
      if labels is None:
        raise ValueError("projection discriminator needs labels")
      emb = L.SNEmbed(num_classes=cfg.num_classes,
                      features=feat.shape[-1], sn_iters=cfg.sn_iters,
                      fully_diff=cfg.fully_diff,
                      name="proj_emb")(labels, update_sn=update_sn)
      score = score + jnp.sum(emb.astype(jnp.float32) * feat, axis=-1)

    class_logits = None
    if cfg.ac_gan:
      class_logits = dense_cls(features=cfg.num_classes, **head_kwargs,
                               name="fc_cls")(feat, update_sn=update_sn)
    return score, class_logits


def make_discriminator(cfg: DiscriminatorConfig) -> Discriminator:
  """Factory mirroring the reference's ``make_discriminator(...)`` [U]."""
  return Discriminator(cfg=cfg)


def preset_filters(arch: str, resolution: int
                   ) -> Tuple[Sequence[int], Sequence[bool]]:
  """Per-dataset default D widths + per-block downsampling (paper §5)."""
  if arch == "dcgan":
    f = {16: (64, 128), 32: (64, 128, 256), 48: (64, 128, 256),
         64: (64, 128, 256, 512)}[resolution]
    return f, tuple(True for _ in f)
  if resolution == 16:
    return (64, 128, 128), (True, True, False)
  if resolution == 32:
    return (128, 128, 128, 128), (True, True, False, False)
  if resolution == 48:
    return (64, 128, 256, 512, 1024), (True, True, True, True, False)
  return (64, 128, 256, 512, 1024), (True, True, True, True, False)
