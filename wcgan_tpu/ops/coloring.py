"""Coloring transforms — the learned half of Whitening-and-Coloring.

Reimplements the reference's coloring layers
(``conditional_layers.py::ConditionalConv11 / ConditionalDense /
ConditionalCenterScale / CenterScale`` [U], paper §4) as pure functions over
2-D row-major features ``x_hat`` of shape (R, C) — a 1x1 conv over NHWC is
exactly a matmul over the flattened (N*H*W, C) rows, which is the
MXU-friendly formulation.

Variants (paper Eq. 5 and §4.1):
- uncond   : Gamma x_hat + beta                                  ("uconv")
- cond     : class branch + agnostic branch summed:              ("ccsconv")
             (Gamma^c x_hat + beta^c) + (Gamma x_hat + beta)
- cond-sa  : soft assignment — Gamma^c = sum_k A[y, k] Gamma_k   ("*-sa")
             with K shared basis filters and learned class embedding A
             (K = ``--filters_emb``, default 10).
- scale-shift ("s") : diagonal coloring, the BN-gamma/beta baseline; the
  conditional form is the reference's ``ConditionalCenterScale``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

_HIGHEST = lax.Precision.HIGHEST


def color_uncond(x_hat: jax.Array, gamma: jax.Array,
                 beta: jax.Array) -> jax.Array:
  """Unconditional coloring: ``x_hat @ gamma^T + beta``.

  gamma: (C_out, C_in); beta: (C_out,). Equivalent to the reference's
  unconditional 1x1 conv coloring (``uconv`` code [U]).
  """
  out = jnp.matmul(x_hat, gamma.T.astype(x_hat.dtype), precision=_HIGHEST)
  return out + beta.astype(out.dtype)


def color_cond(
    x_hat: jax.Array,
    labels: jax.Array,
    gamma_c: jax.Array,
    beta_c: jax.Array,
    gamma_a: Optional[jax.Array] = None,
    beta_a: Optional[jax.Array] = None,
) -> jax.Array:
  """Class-conditional coloring (cWC, paper Eq. 5).

  Args:
    x_hat:   (R, C_in) whitened rows; rows of the same image share a label.
    labels:  (R,) int32 per-row class ids (pre-broadcast over H*W).
    gamma_c: (num_classes, C_out, C_in) class-specific coloring filters.
    beta_c:  (num_classes, C_out).
    gamma_a / beta_a: optional class-agnostic branch, summed with the class
      branch as in the reference's combined ``ccsconv``-style codes [U].
  """
  g = gamma_c[labels].astype(x_hat.dtype)        # (R, C_out, C_in)
  out = jnp.einsum("rc,roc->ro", x_hat, g, precision=_HIGHEST)
  out = out + beta_c[labels].astype(out.dtype)
  if gamma_a is not None:
    out = out + color_uncond(
        x_hat, gamma_a,
        beta_a if beta_a is not None else jnp.zeros(gamma_a.shape[0]))
  return out


def color_cond_sa(
    x_hat: jax.Array,
    labels: jax.Array,
    basis: jax.Array,
    embedding: jax.Array,
    beta_emb: jax.Array,
    gamma_a: Optional[jax.Array] = None,
    beta_a: Optional[jax.Array] = None,
) -> jax.Array:
  """Soft-assignment conditional coloring (cWC-sa, paper §4.1).

  Gamma^c = sum_k A[y, k] Gamma_k with K shared basis filters: instead of
  materializing per-row (C_out, C_in) matrices, we compute all K basis
  responses once — (R, C_in) x (K, C_out, C_in) -> (R, K, C_out) — and
  contract with the per-row soft-assignment weights. Both contractions are
  MXU matmuls; nothing is gathered at (C x C) granularity.

  Args:
    basis:     (K, C_out, C_in) shared basis filters (K = --filters_emb).
    embedding: (num_classes, K) learned class-to-basis weights A.
    beta_emb:  (num_classes, C_out) per-class bias.
  """
  a = embedding[labels].astype(x_hat.dtype)      # (R, K)
  # (R, C_in) . (K, C_out, C_in) -> (R, K, C_out)
  responses = jnp.einsum("rc,koc->rko", x_hat, basis.astype(x_hat.dtype),
                         precision=_HIGHEST)
  out = jnp.einsum("rk,rko->ro", a, responses, precision=_HIGHEST)
  out = out + beta_emb[labels].astype(out.dtype)
  if gamma_a is not None:
    out = out + color_uncond(
        x_hat, gamma_a,
        beta_a if beta_a is not None else jnp.zeros(gamma_a.shape[0]))
  return out


def center_scale(x: jax.Array, gamma: jax.Array, beta: jax.Array) -> jax.Array:
  """Diagonal scale-shift (the reference's ``CenterScale`` / code 's' [U])."""
  return x * gamma.astype(x.dtype) + beta.astype(x.dtype)


def conditional_center_scale(
    x: jax.Array, labels: jax.Array,
    gamma: jax.Array, beta: jax.Array) -> jax.Array:
  """Per-class diagonal scale-shift (``ConditionalCenterScale`` [U]).

  gamma/beta: (num_classes, C); labels: (R,) per-row ids.
  """
  return x * gamma[labels].astype(x.dtype) + beta[labels].astype(x.dtype)
