"""Coloring transforms — the learned half of Whitening-and-Coloring.

Reimplements the reference's coloring layers
(``conditional_layers.py::ConditionalConv11 / ConditionalDense /
ConditionalCenterScale / CenterScale`` [U], paper §4) as pure functions.
A 1x1 conv over NHWC is exactly a matmul over the channel axis — the
MXU-native formulation.

Conditional variants operate on (N, S, C) with ONE label per image
(S = H*W spatial positions): all rows of an image share its class, so
the class filter is gathered **per image** — (N, C_out, C_in), a few MB —
and applied as a batched matmul. A per-row formulation would gather
(N*S, C_out, C_in) (gigabytes at feature-map sizes) or, for the
soft-assignment variant, cost K× the matmul FLOPs; per-image is K×/S×
cheaper (measured 2x end-to-end step time on the cWC-sa config).

Variants (paper Eq. 5 and §4.1):
- uncond   : Gamma x_hat + beta                                  ("uconv")
- cond     : class branch + agnostic branch summed:              ("ucconv")
             (Gamma^c x_hat + beta^c) + (Gamma x_hat + beta)
- cond-sa  : soft assignment — Gamma^c = sum_k A[y, k] Gamma_k   ("*-sa")
             with K shared basis filters and learned class embedding A
             (K = ``--filters_emb``, default 10).
- scale-shift ("s"/"ccs") : diagonal coloring, the BN-gamma/beta baseline.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

_HIGHEST = lax.Precision.HIGHEST


def color_uncond(x_hat: jax.Array, gamma: jax.Array,
                 beta: jax.Array) -> jax.Array:
  """Unconditional coloring: ``x_hat @ gamma^T + beta`` over the last dim.

  gamma: (C_out, C_in); beta: (C_out,). Works for any leading shape.
  Equivalent to the reference's unconditional 1x1 conv coloring
  (``uconv`` code [U])."""
  out = jnp.matmul(x_hat, gamma.T.astype(x_hat.dtype), precision=_HIGHEST)
  return out + beta.astype(out.dtype)


def _cond_apply(x_nsc: jax.Array, g_img: jax.Array,
                b_img: jax.Array) -> jax.Array:
  """(N, S, C_in) x per-image (N, C_out, C_in) + (N, C_out)."""
  out = jnp.einsum("nsc,noc->nso", x_nsc, g_img.astype(x_nsc.dtype),
                   precision=_HIGHEST)
  return out + b_img.astype(out.dtype)[:, None, :]


def _add_agnostic(out, x_nsc, gamma_a, beta_a):
  """Sum the optional class-agnostic branch onto a conditional coloring —
  the one definition of the combined-code tail (``ucconv``/``ucconv-sa``
  [U]) shared by color_cond and color_cond_sa."""
  if gamma_a is None:
    return out
  return out + color_uncond(
      x_nsc, gamma_a,
      beta_a if beta_a is not None else jnp.zeros(gamma_a.shape[0]))


def color_cond(
    x_nsc: jax.Array,
    labels: jax.Array,
    gamma_c: jax.Array,
    beta_c: jax.Array,
    gamma_a: Optional[jax.Array] = None,
    beta_a: Optional[jax.Array] = None,
) -> jax.Array:
  """Class-conditional coloring (cWC, paper Eq. 5).

  Args:
    x_nsc:   (N, S, C_in) whitened features, one label per image.
    labels:  (N,) int32 class ids.
    gamma_c: (num_classes, C_out, C_in) class-specific coloring filters.
    beta_c:  (num_classes, C_out).
    gamma_a / beta_a: optional class-agnostic branch, summed with the
      class branch (the reference's combined ``ucconv``-style codes [U]).
  """
  out = _cond_apply(x_nsc, gamma_c[labels], beta_c[labels])
  return _add_agnostic(out, x_nsc, gamma_a, beta_a)


def color_cond_sa(
    x_nsc: jax.Array,
    labels: jax.Array,
    basis: jax.Array,
    embedding: jax.Array,
    beta_emb: jax.Array,
    gamma_a: Optional[jax.Array] = None,
    beta_a: Optional[jax.Array] = None,
) -> jax.Array:
  """Soft-assignment conditional coloring (cWC-sa, paper §4.1).

  Gamma^c = sum_k A[y, k] Gamma_k is materialized per IMAGE
  ((N, C_out, C_in), one small einsum over the K basis filters), then
  applied as a batched matmul — K× fewer row-matmul FLOPs than applying
  every basis filter to every row.

  Args:
    basis:     (K, C_out, C_in) shared basis filters (K = --filters_emb).
    embedding: (num_classes, K) learned class-to-basis weights A.
    beta_emb:  (num_classes, C_out) per-class bias.
  """
  a = embedding[labels]                              # (N, K)
  # The einsum lowers on TPU as a pad-heavy rhs_reversal convolution;
  # that is the FAST form — the flat-GEMM alternative measured 7%
  # slower at cfg4 (r5 negative result, see models/layers.py same
  # fold for the full story).
  g_img = jnp.einsum("nk,koc->noc", a, basis, precision=_HIGHEST)
  out = _cond_apply(x_nsc, g_img, beta_emb[labels])
  return _add_agnostic(out, x_nsc, gamma_a, beta_a)


def center_scale(x: jax.Array, gamma: jax.Array, beta: jax.Array) -> jax.Array:
  """Diagonal scale-shift (the reference's ``CenterScale`` / code 's' [U])."""
  return x * gamma.astype(x.dtype) + beta.astype(x.dtype)


def conditional_center_scale(
    x_nsc: jax.Array, labels: jax.Array,
    gamma: jax.Array, beta: jax.Array) -> jax.Array:
  """Per-class diagonal scale-shift (``ConditionalCenterScale`` [U]).

  x_nsc: (N, S, C); gamma/beta: (num_classes, C); labels: (N,)."""
  g = gamma[labels].astype(x_nsc.dtype)[:, None, :]
  b = beta[labels].astype(x_nsc.dtype)[:, None, :]
  return x_nsc * g + b
