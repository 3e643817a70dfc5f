"""Batch whitening numerics — the core of the WC transform.

TPU-native reimplementation of the reference's ``DecorelationNormalization``
Keras layer (``conditional_layers.py::DecorelationNormalization`` [U],
paper Eq. 2–4): per-batch channel mean and full covariance, inverse square
root, and application ``x_hat = Sigma^{-1/2} (x - mu)``.

Design notes (TPU-first, see SURVEY.md §7 hard-part #1):

- The reference uses ``tf.cholesky`` + triangular solve. Triangular solves
  lower poorly on TPU (sequential); the idiomatic choice is the coupled
  **Newton–Schulz** iteration — pure matmuls that run on the MXU. A
  Cholesky-based path is kept as the correctness oracle / fallback.
- All moment and iteration matmuls run in float32 with multi-pass MXU
  emulation (HIGH by default, HIGHEST for reference parity — see the
  _PRECISION note below): measured on TPU v5 lite, Newton–Schulz plateaus
  at ~2e-2 error under default bf16 MXU passes but converges to ~1e-6 in
  <=15 iterations with float32 dots.
- Cross-replica semantics: moments (count, sum, sum of outer products) are
  reduced with ``lax.pmean`` over a named mesh axis *before* the inverse
  square root, so whitening statistics match global-batch semantics under
  data parallelism (BASELINE.json:"north_star").
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# float32 whitening math with multi-pass MXU emulation. Raw bf16 passes
# (DEFAULT) do not converge for Newton--Schulz (measured; see module
# docstring). The shipped default is HIGH (3-pass emulation): a measured
# +3.9% outer step over HIGHEST (6-pass) at a 20x higher — still tiny —
# whitening-residual floor (max|W cov W^T - I| 6.1e-4 vs 2.8e-5), and
# PROMOTED to default after a clean 10k-outer-step soak at the config-2
# shape (r3: live residual plateaued at 1.1e-4, covariance conditioning
# healthy at ~2.6e3 — docs/SOAK.md addendum). HIGHEST remains the
# reference-parity knob (--whitening_precision highest). CAUTION from the
# same soak campaign: iteration count is the sharp axis, not precision —
# ns_iters=12 under-converges once cond exceeds ~1e3 and feeds back into
# a conditioning explosion (cond 80 -> 32k); the trainer's live
# wc_whiten_residual_max probe guards this. set_precision() is read at
# trace time; set once at startup.
_PRECISION = lax.Precision.HIGH


def set_precision(name: str) -> None:
  """Set the precision of all whitening-path matmuls: 'high' (default,
  3-pass bf16 MXU emulation) or 'highest' (6-pass, reference parity).
  On CPU both are exact f32 (passes are an MXU concept)."""
  global _PRECISION
  try:
    _PRECISION = {"highest": lax.Precision.HIGHEST,
                "high": lax.Precision.HIGH}[name]
  except KeyError:
    raise ValueError(f"whitening precision must be 'highest' or 'high', "
                     f"got {name!r}")
  # The jitted wrappers in this module close over module state read at
  # trace time; drop their caches so a mid-process switch retraces
  # DIRECT callers of these functions. It cannot reach consumers that
  # traced them inline under an OUTER jit (the fused train step): those
  # executables keep the old precision — hence the "set once at
  # startup, before building any step function" contract above (the
  # trainer/CLI honor it; review r3).
  for fn in (batch_moments, newton_schulz_inv_sqrt, newton_schulz_sqrt,
             inv_sqrt, whiten_apply, whiten_train, whiten_eval):
    if hasattr(fn, "clear_cache"):
      fn.clear_cache()


def _f32(x: jax.Array) -> jax.Array:
  return x.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("axis_name", "use_pallas"))
def batch_moments(
    x2d: jax.Array,
    axis_name: Optional[str] = None,
    use_pallas: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
  """Mean and covariance of rows of ``x2d`` ((R, C) -> ((C,), (C, C))).

  When ``axis_name`` is given (inside ``shard_map``/``pmap``), moments are
  combined across replicas so the returned covariance is the covariance
  of the *global* batch — the reference's single-device semantics
  extended to a TPU mesh. We reduce moments, never whitening matrices
  (SURVEY.md §7 hard-part #3).

  ``use_pallas`` selects the fused one-kernel TPU moment pass
  (ops/pallas_wc.py); None = auto (on for TPU backends). Both paths use
  the numerically exact two-pass centered formula — the one-pass
  E[xx^T] - mu mu^T cancels catastrophically in f32 when |mu| >> sigma
  (constant features then yield *negative* diagonal rounding junk that
  makes Newton-Schulz diverge — found by a rank-1-input probe).
  """
  if use_pallas is None:
    from wcgan_tpu.ops import pallas_wc
    use_pallas = pallas_wc._on_tpu()
  if use_pallas:
    from wcgan_tpu.ops import pallas_wc
    mean, cov = pallas_wc.moments(x2d)
    if axis_name is not None:
      # The kernel centers on the LOCAL mean; combine exactly via the
      # parallel-variance formula (equal shard sizes):
      # Sigma = E_r[Sigma_r] + E_r[(mu_r - mu)(mu_r - mu)^T].
      gmean = lax.pmean(mean, axis_name)
      d = mean - gmean
      cov = lax.pmean(cov + jnp.outer(d, d), axis_name)
      mean = gmean
    return mean, cov

  x2d = _f32(x2d)
  mean = jnp.mean(x2d, axis=0)
  if axis_name is not None:
    mean = lax.pmean(mean, axis_name)
  # Centering against the already-reduced global mean keeps per-replica
  # covariances exactly averageable: with equal shard sizes,
  # pmean_r[(x_r-mu)^T (x_r-mu)/R_r] is the global-batch covariance.
  xc = x2d - mean
  cov = jnp.matmul(xc.T, xc, precision=_PRECISION) / x2d.shape[0]
  if axis_name is not None:
    cov = lax.pmean(cov, axis_name)
  return mean, cov


def _spd_jitter(cov, eps):
  """THE SPD-safety jitter, shared by the Newton–Schulz and Cholesky
  paths (review r3: the 89585a6 fix originally landed on the oracle
  only, leaving the DEFAULT NS path to NaN on the same inputs).

  eps*mean_diag: scale-RELATIVE conditioning jitter (unlike the
  reference's absolute epsilon) so conditioning is controlled uniformly
  regardless of activation scale. 2*neg_diag: compensates diagonals that
  round NEGATIVE for near-constant features under MXU emulation
  (measured at ~1e-9..1e-7; the 2x also dominates the off-diagonal junk
  of the same magnitude). 1e-12: absolute floor so an all-zero
  covariance (constant features) stays SPD. Zero-extra for healthy
  covariances."""
  c = cov.shape[-1]
  mean_diag = jnp.maximum(jnp.trace(cov) / c, 0.0)
  neg_diag = jnp.maximum(-jnp.min(jnp.diagonal(cov)), 0.0)
  return eps * mean_diag + 2.0 * neg_diag + 1e-12


def _jittered_normalized(cov, eps, scaling="trace"):
  """(cov + jitter*I) / s — SPD-safe jitter + convergence normalization.

  Both scalings guarantee Newton–Schulz convergence (eigenvalues land in
  (0, 1] so ||I - A||_2 < 1), but they are NOT equal in convergence
  speed: for SPD, lambda_max <= ||A||_F <= tr(A), so 'trace' shrinks the
  spectrum by up to the channel count more than necessary while 'fro'
  keeps eigenvalues as large as a matmul-free bound allows. Measured
  (r4, f32, C=256, log-uniform AND spiked spectra; docs/SOAK.md
  'ns_scaling calibration'): at the shipped 15 iterations 'fro' is
  never worse and is 3–31x more converged exactly in the
  high-conditioning log-uniform regime the recorded feedback loops
  live in (cond 1e4: residual 7.9e-2 -> 2.5e-3; cond 3e4:
  1.9e-1 -> 2.2e-2; equal at cond <= 1e2 and on spiked spectra, where
  both are fully converged). Identical matmul count — the scale is one
  elementwise reduction either way. 'trace' stays the default pending
  the soak-gate (IterNorm parity)."""
  cov = _f32(cov)
  c = cov.shape[-1]
  ident = jnp.eye(c, dtype=jnp.float32)
  a = cov + _spd_jitter(cov, eps) * ident
  if scaling == "trace":
    scale = jnp.trace(a)
  elif scaling == "fro":
    scale = jnp.sqrt(jnp.sum(a * a))
  else:
    raise ValueError(f"ns scaling must be 'trace' or 'fro', "
                     f"got {scaling!r}")
  a = a / scale
  return a, scale, ident


def _ns_iterate(a, ident, num_iters):
  """Run the coupled Newton–Schulz iteration; returns (Y, Z).

  Implemented with ``lax.scan`` (not ``fori_loop``) so the whole whitening
  transform is reverse-mode differentiable — the backward pass through the
  iteration is the standard way to differentiate the inverse square root
  (IterNorm / decorrelated-BN practice), and XLA unrolls/fuses the small
  C×C matmuls either way.
  """

  def body(yz, _):
    y, z = yz
    t = 1.5 * ident - 0.5 * jnp.matmul(z, y, precision=_PRECISION)
    y = jnp.matmul(y, t, precision=_PRECISION)
    z = jnp.matmul(t, z, precision=_PRECISION)
    return (y, z), None

  # Full unroll: the iterations are tiny sequential C x C matmuls; a
  # rolled loop pays per-iteration dispatch that dwarfs the math on TPU.
  (y, z), _ = lax.scan(body, (a, ident), None, length=num_iters,
                       unroll=True)
  return y, z


@functools.partial(jax.jit, static_argnames=("num_iters", "scaling"))
def newton_schulz_inv_sqrt(
    cov: jax.Array,
    num_iters: int = 15,
    eps: float = 1e-5,
    scaling: str = "trace",
) -> jax.Array:
  """Inverse principal square root of an SPD matrix via coupled Newton–Schulz.

  Returns W with ``W @ cov @ W.T ~= I``. Matmul-only — maps onto the MXU
  with no data-dependent control flow; replaces the reference's
  Cholesky + triangular solve (``DecorelationNormalization.call`` [U]).

  The iteration operates on ``A = (cov + jitter I) / tr`` where the
  jitter is SCALE-RELATIVE — ``eps * mean_diag(cov)`` plus SPD-safety
  terms (see ``_spd_jitter``), NOT the reference's absolute epsilon —
  and trace normalization guarantees ||I - A|| < 1 so it converges:
    Y_0 = A, Z_0 = I
    T_k = (3 I - Z_k Y_k) / 2
    Y_{k+1} = Y_k T_k,  Z_{k+1} = T_k Z_k
  Z_k -> A^{-1/2}, so cov^{-1/2} = Z / sqrt(tr).

  Iteration-count calibration, measured on covariances from a REAL
  trained WC generator (digits run; condition numbers 3-477): whitening
  error max|W cov W^T - I| is 2.7e-1 at 8 iterations, 1.4e-2 at 10,
  5.4e-5 at 12, and flat beyond. But static calibration is NOT the whole
  story: in closed loop, ns_iters=12 under-converges once the covariance
  conditioning exceeds ~1e3 and FEEDS BACK into a conditioning explosion
  (cond 80 -> 32k over 10k steps; measured, docs/SOAK.md) — do not lower
  --ns_iters below the default 15 at WC-GAN shapes (module docstring,
  CLAUDE.md). This holds under BOTH scalings: on the spiked spectra live
  covariances take, tr ~= ||.||_F, so 'fro' does not license fewer
  iterations either (fro@13 is 66x worse than trace@15 at spiked cond
  1e4 — measured negative result, docs/SOAK.md r4). The trainer's live
  wc_whiten_residual_max probe guards it.
  """
  a, scale, ident = _jittered_normalized(cov, eps, scaling)
  _, z = _ns_iterate(a, ident, num_iters)
  return z / jnp.sqrt(scale)


@functools.partial(jax.jit, static_argnames=("num_iters", "scaling"))
def newton_schulz_sqrt(
    cov: jax.Array,
    num_iters: int = 15,
    eps: float = 1e-5,
    scaling: str = "trace",
) -> jax.Array:
  """Principal square root (Y branch of the same coupled iteration).

  Used by the coloring-from-running-stats ('dr') inference path and by the
  FID Fréchet-distance term (eval/fid.py).
  """
  a, scale, ident = _jittered_normalized(cov, eps, scaling)
  y, _ = _ns_iterate(a, ident, num_iters)
  return y * jnp.sqrt(scale)


def cholesky_inv_sqrt(cov: jax.Array, eps: float = 1e-5) -> jax.Array:
  """Cholesky-based inverse square root — the correctness oracle.

  Matches the reference's decomposition choice
  (``DecorelationNormalization`` uses Cholesky, paper Eq. 3 [U]). Returns
  the *lower-triangular* L^{-1} with L L^T = cov, so W @ cov @ W.T = I.
  Lowers on TPU but serializes; prefer :func:`newton_schulz_inv_sqrt` in
  the hot path.
  """
  cov = _f32(cov)
  c = cov.shape[-1]
  ident = jnp.eye(c, dtype=jnp.float32)
  chol = jnp.linalg.cholesky(cov + _spd_jitter(cov, eps) * ident)
  return lax.linalg.triangular_solve(
      chol, ident, left_side=True, lower=True)


def whiten_apply(x2d: jax.Array, mean: jax.Array, w: jax.Array) -> jax.Array:
  """``(x - mean) @ W^T`` — the whitening application, rows = samples.

  Precision is where W is COMPUTED (moments + Newton-Schulz), not where
  it is applied: for bf16 activations the result is rounded to bf16
  anyway, so the row matmul runs as one native bf16 MXU pass (the mean
  term folds into a f32 bias) instead of six f32-emulation passes —
  the same activation-noise class at 1/6 the row cost, consistent with
  the folded (ΓW) paths in models/layers.py. f32 activations keep the
  full-precision pass (reference-parity mode)."""
  if x2d.dtype == jnp.bfloat16:
    bias = -jnp.matmul(mean, w.T, precision=_PRECISION)
    return (jnp.matmul(x2d, w.T.astype(jnp.bfloat16))
            + bias.astype(jnp.bfloat16))
  out = jnp.matmul(_f32(x2d) - mean, w.T, precision=_PRECISION)
  return out.astype(x2d.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_iters", "method", "scaling"))
def inv_sqrt(cov, num_iters: int = 15, eps: float = 1e-5,
             method: str = "newton_schulz", scaling: str = "trace"):
  """Dispatch helper: 'newton_schulz' (TPU hot path) or 'cholesky' (oracle)."""
  if method == "newton_schulz":
    return newton_schulz_inv_sqrt(cov, num_iters=num_iters, eps=eps,
                                  scaling=scaling)
  if method == "cholesky":
    return cholesky_inv_sqrt(cov, eps=eps)
  raise ValueError(f"unknown inv-sqrt method: {method!r}")


def stats_select_and_ema(batch_mean, batch_cov, moving_mean, moving_cov,
                         *, use_batch: bool, momentum: float):
  """THE single encoding of the reference's 'd'/'dr' stats contract [U]:
  the transform's source moments are the batch statistics for 'd'
  (``use_batch=True``) or the PRE-update running statistics for 'dr';
  the running stats EMA-update from the batch either way (BN-style
  momentum). Returns (mean, stat_src, new_moving_mean, new_moving_cov).
  Every training path — the general DecorrelationNorm, whiten_train, and
  the fused NormColor paths — must route through this helper so the
  semantics cannot drift apart."""
  new_mean = momentum * _f32(moving_mean) + (1.0 - momentum) * batch_mean
  new_cov = momentum * _f32(moving_cov) + (1.0 - momentum) * batch_cov
  if use_batch:
    return batch_mean, batch_cov, new_mean, new_cov
  return _f32(moving_mean), _f32(moving_cov), new_mean, new_cov


@functools.partial(
    jax.jit,
    static_argnames=("momentum", "eps", "num_iters", "axis_name", "method",
                     "scaling"))
def whiten_train(
    x2d: jax.Array,
    moving_mean: jax.Array,
    moving_cov: jax.Array,
    *,
    momentum: float = 0.99,
    eps: float = 1e-5,
    num_iters: int = 15,
    axis_name: Optional[str] = None,
    method: str = "newton_schulz",
    scaling: str = "trace",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
  """Training-mode whitening from batch statistics ('d' mode).

  Returns (whitened x2d, new_moving_mean, new_moving_cov). Moving stats
  follow the reference's BN-style EMA (``moving_mean``/``moving_cov``
  updated with momentum, used at inference;
  ``DecorelationNormalization`` [U]).
  """
  batch_mean, batch_cov = batch_moments(x2d, axis_name=axis_name)
  mean, stat_src, new_mean, new_cov = stats_select_and_ema(
      batch_mean, batch_cov, moving_mean, moving_cov,
      use_batch=True, momentum=momentum)
  if method == "cholesky":
    w = cholesky_inv_sqrt(stat_src, eps=eps)
  else:
    w = newton_schulz_inv_sqrt(stat_src, num_iters=num_iters, eps=eps,
                               scaling=scaling)
  out = whiten_apply(x2d, mean, w)
  return out, new_mean, new_cov


@functools.partial(
    jax.jit, static_argnames=("eps", "num_iters", "method", "scaling"))
def whiten_eval(
    x2d: jax.Array,
    moving_mean: jax.Array,
    moving_cov: jax.Array,
    *,
    eps: float = 1e-5,
    num_iters: int = 15,
    method: str = "newton_schulz",
    scaling: str = "trace",
) -> jax.Array:
  """Inference-mode whitening from running statistics."""
  if method == "cholesky":
    w = cholesky_inv_sqrt(_f32(moving_cov), eps=eps)
  else:
    w = newton_schulz_inv_sqrt(_f32(moving_cov), num_iters=num_iters,
                               eps=eps, scaling=scaling)
  return whiten_apply(x2d, _f32(moving_mean), w)
