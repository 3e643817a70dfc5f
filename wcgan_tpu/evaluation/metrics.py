"""IS / FID math — pure functions, on-device.

- Inception Score (``gan/inception_score.py::get_inception_score`` [U]):
  exp(E_x KL(p(y|x) || p(y))) over ``splits`` splits.
- FID (``gan/fid.py`` [U]): ||mu1-mu2||^2 + Tr(S1 + S2 - 2 (S1 S2)^{1/2}).
  The reference uses ``scipy.linalg.sqrtm`` on host; here the trace of the
  geometric-mean term is computed on-device as
  Tr sqrtm(S1^{1/2} S2 S1^{1/2}) via two Newton–Schulz square roots —
  matmul-only (MXU), no host round-trip, no complex dtypes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from wcgan_tpu.ops import whiten

_HIGHEST = jax.lax.Precision.HIGHEST


def inception_score(probs: jax.Array, splits: int = 10
                    ) -> Tuple[jax.Array, jax.Array]:
  """(mean, std) of exp(E KL(p(y|x) || p(y))) over ``splits`` splits.

  probs: (N, num_classes) softmax outputs for generated images. The split
  semantics match the reference (contiguous chunks, 10 splits [U])."""
  probs = probs.astype(jnp.float32)
  n = probs.shape[0]
  per = n // splits
  probs = probs[:per * splits].reshape(splits, per, -1)
  marginal = jnp.mean(probs, axis=1, keepdims=True)
  kl = jnp.sum(probs * (jnp.log(probs + 1e-16)
                        - jnp.log(marginal + 1e-16)), axis=-1)
  scores = jnp.exp(jnp.mean(kl, axis=1))
  return jnp.mean(scores), jnp.std(scores)


def moments_from_activations(acts: jax.Array
                             ) -> Tuple[jax.Array, jax.Array]:
  """(mu, covariance) of activation rows — unbiased covariance like
  ``np.cov`` (the FID convention)."""
  acts = acts.astype(jnp.float32)
  n = acts.shape[0]
  mu = jnp.mean(acts, axis=0)
  xc = acts - mu
  sigma = jnp.matmul(xc.T, xc, precision=_HIGHEST) / (n - 1)
  return mu, sigma


def _sqrtm_eigh(s: jax.Array) -> jax.Array:
  """Exact SPD square root via eigendecomposition (eigenvalues clamped
  at 0 — Inception covariances from <2048 samples are rank-deficient)."""
  w, v = jnp.linalg.eigh(s)
  w = jnp.maximum(w, 0.0)
  return jnp.matmul(v * jnp.sqrt(w), v.T, precision=_HIGHEST)


@functools.partial(jax.jit, static_argnames=("num_iters", "method"))
def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6,
                     num_iters: int = 20,
                     method: str = "eigh") -> jax.Array:
  """||mu1-mu2||^2 + Tr(S1 + S2 - 2 sqrtm(S1 S2)).

  Tr sqrtm(S1 S2) = Tr sqrtm(S1^{1/2} S2 S1^{1/2}) (similar matrices;
  the inner form is SPD).

  method='eigh' (default): exact square roots via eigendecomposition.
  Scoring is off the training hot path and the 2048-dim Inception
  covariances from 10k samples are near-singular — iterative Newton–
  Schulz convergence degrades with condition number (the repo's own
  calibration, ops/whiten.py), so the scoring path uses the exact
  factorization like the reference's scipy.sqrtm.
  method='ns': matmul-only Newton–Schulz (MXU-friendly, no eigh) — kept
  for hosts/accelerators where eigh is the bottleneck; validated against
  the eigh oracle in tests/test_evaluation.py."""
  mu1, mu2 = mu1.astype(jnp.float32), mu2.astype(jnp.float32)
  s1 = sigma1.astype(jnp.float32)
  s2 = sigma2.astype(jnp.float32)
  diff = jnp.sum(jnp.square(mu1 - mu2))
  if method == "eigh":
    s1_half = _sqrtm_eigh(s1)
  else:
    s1_half = whiten.newton_schulz_sqrt(s1, num_iters=num_iters, eps=eps)
  inner = jnp.matmul(jnp.matmul(s1_half, s2, precision=_HIGHEST),
                     s1_half, precision=_HIGHEST)
  # Symmetrize against rounding before the second square root.
  inner = 0.5 * (inner + inner.T)
  if method == "eigh":
    w = jnp.linalg.eigvalsh(inner)
    tr_geo = jnp.sum(jnp.sqrt(jnp.maximum(w, 0.0)))
  else:
    geo = whiten.newton_schulz_sqrt(inner, num_iters=num_iters, eps=eps)
    tr_geo = jnp.trace(geo)
  fid = diff + jnp.trace(s1) + jnp.trace(s2) - 2.0 * tr_geo
  # True Frechet distance is >= 0; tiny negatives are sqrt trace error.
  return jnp.maximum(fid, 0.0)


def fid_from_moments(mu1, sigma1, mu2, sigma2, **kw) -> float:
  return float(frechet_distance(mu1, sigma1, mu2, sigma2, **kw))
