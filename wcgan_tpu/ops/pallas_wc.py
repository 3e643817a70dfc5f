"""Pallas TPU kernel for the WC transform's moment pass.

The north star mandates a fused Pallas kernel for the WC layer
(BASELINE.json:"north_star"). Analysis of the op's dataflow (SURVEY.md
§3.2, §7 hard-part #2) splits it into:

  1. moments:   x (R, C) -> mean (C,), covariance (C, C)   [R-reduction]
  2. inv-sqrt:  Newton-Schulz on the C x C covariance      [tiny matmuls]
  3. coloring:  x_hat @ Gamma^T + beta                     [R-row matmul]

Phase 2's matmuls are C<=512 — XLA schedules those optimally already, and
phase 3 folds algebraically into ONE matmul, out = (x - mu) @ (Gamma W)^T
+ beta, which XLA fuses with its bias add. The bandwidth win lives in
phase 1: a naive XLA lowering reads x twice (mean, then centered
covariance) and may materialize the centered intermediate. This kernel
computes BOTH moments in one ``pallas_call`` with a two-phase sequential
grid — phase 0 accumulates the row sum, the mean is formed in VMEM
scratch, phase 1 accumulates the *centered* outer product (numerically
exact two-pass semantics; the one-pass E[xx^T] - mu mu^T form
catastrophically cancels when |mu| >> sigma, see ops/whiten.py) — with
zero HBM intermediates and f32 accumulation regardless of input dtype.

A custom VJP makes the kernel differentiable: for
(mu, Sigma) = moments(x),

  dx_r = (1/R) [ (dSigma + dSigma^T)(x_r - mu) + dmu ]

(the mu-dependence inside Sigma contributes Sum_r (x_r - mu) = 0), i.e.
one more row-block matmul — no recomputation of the forward.

CPU/debug fallback: ``interpret=True`` via ``force_interpret`` or
automatically off-TPU, so the same code path runs everywhere
(SURVEY.md §7 step 2).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEF_BLOCK_ROWS = 1024


def _on_tpu() -> bool:
  try:
    return jax.devices()[0].platform in ("tpu", "axon")
  except Exception:  # pragma: no cover
    return False


def _moments_kernel(x_ref, mean_ref, cov_ref, acc_sum, acc_xxt, *,
                    rows: int, block_rows: int):
  phase = pl.program_id(0)
  i = pl.program_id(1)
  nblocks = pl.num_programs(1)

  xb = x_ref[:].astype(jnp.float32)
  # Mask tail rows of the last (padded) block.
  row_ids = i * block_rows + jax.lax.broadcasted_iota(
      jnp.int32, (block_rows, 1), 0)
  xb = jnp.where(row_ids < rows, xb, 0.0)

  @pl.when(jnp.logical_and(phase == 0, i == 0))
  def _():
    acc_sum[:] = jnp.zeros_like(acc_sum)

  @pl.when(phase == 0)
  def _():
    acc_sum[:] += jnp.sum(xb, axis=0, keepdims=True)

  @pl.when(jnp.logical_and(phase == 1, i == 0))
  def _():
    acc_xxt[:] = jnp.zeros_like(acc_xxt)

  @pl.when(phase == 1)
  def _():
    mu = acc_sum[:] / rows                       # lives in VMEM scratch
    xc = xb - mu
    xc = jnp.where(row_ids < rows, xc, 0.0)      # keep pad rows at zero
    # Precision: deliberately UNANNOTATED (measured decision, late r3).
    # Mosaic supports only DEFAULT/HIGHEST on in-kernel dots (HIGH
    # raises NotImplementedError), and pinning HIGHEST measured the
    # whole outer step at 8.4-8.6k imgs/s vs 9.5-9.6k unannotated
    # (-11%, two bench runs each) while the unannotated f32 lowering is
    # already accurate: the on-chip oracle test pins |kernel - XLA-f32
    # moments| <= 1e-4 (tests/test_tpu.py), far below the bf16-pass
    # failure mode (~1e-2) this file documents. The oracle test is the
    # guard that Mosaic's f32 default stays accurate.
    acc_xxt[:] += jax.lax.dot_general(
        xc, xc, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

  @pl.when(jnp.logical_and(phase == 1, i == nblocks - 1))
  def _():
    mean_ref[:] = acc_sum[:] / rows
    cov_ref[:] = acc_xxt[:] / rows


def _moments_pallas(x2d: jax.Array, block_rows: int,
                    interpret: bool) -> Tuple[jax.Array, jax.Array]:
  rows, c = x2d.shape
  block_rows = min(block_rows, max(8, rows))
  nblocks = pl.cdiv(rows, block_rows)
  padded = nblocks * block_rows
  if padded != rows:
    x2d = jnp.pad(x2d, ((0, padded - rows), (0, 0)))

  kernel = functools.partial(_moments_kernel, rows=rows,
                             block_rows=block_rows)
  try:
    # Inside shard_map the outputs vary across the same mesh axes as the
    # (per-replica) input; the vma annotation is required when
    # check_vma=True.
    vma = jax.typeof(x2d).vma
    out_shape = (jax.ShapeDtypeStruct((1, c), jnp.float32, vma=vma),
                 jax.ShapeDtypeStruct((c, c), jnp.float32, vma=vma))
  except (AttributeError, TypeError):
    out_shape = (jax.ShapeDtypeStruct((1, c), jnp.float32),
                 jax.ShapeDtypeStruct((c, c), jnp.float32))
  mean, cov = pl.pallas_call(
      kernel,
      grid=(2, nblocks),
      in_specs=[pl.BlockSpec((block_rows, c), lambda p, i: (i, 0),
                             memory_space=pltpu.VMEM)],
      out_specs=(pl.BlockSpec((1, c), lambda p, i: (0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((c, c), lambda p, i: (0, 0),
                              memory_space=pltpu.VMEM)),
      out_shape=out_shape,
      scratch_shapes=[pltpu.VMEM((1, c), jnp.float32),
                      pltpu.VMEM((c, c), jnp.float32)],
      cost_estimate=pl.CostEstimate(
          flops=2 * padded * c * c + 2 * padded * c,
          bytes_accessed=2 * padded * c * x2d.dtype.itemsize
          + 4 * c * (c + 1),
          transcendentals=0),
      # Both grid dims carry state across steps (phase 0's sum feeds
      # phase 1; accumulators persist across row blocks) — pin them to
      # sequential execution rather than relying on Mosaic's default.
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary", "arbitrary")),
      interpret=interpret,
  )(x2d)
  return mean[0], cov


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def moments(x2d: jax.Array, block_rows: int = _DEF_BLOCK_ROWS,
            interpret: Optional[bool] = None
            ) -> Tuple[jax.Array, jax.Array]:
  """(mean, covariance) of rows of x2d — fused single-kernel TPU path.

  Drop-in for the moment math of ``whiten.batch_moments`` (divide-by-R
  covariance, f32 outputs). ``interpret=None`` auto-selects compiled on
  TPU / interpreter elsewhere.
  """
  if interpret is None:
    interpret = not _on_tpu()
  return _moments_pallas(x2d, block_rows, interpret)


def _moments_fwd(x2d, block_rows, interpret):
  out = moments(x2d, block_rows, interpret)
  return out, (x2d, out[0])


def _moments_bwd(block_rows, interpret, res, cot):
  del block_rows, interpret
  from wcgan_tpu.ops import whiten as whiten_ops
  x2d, mean = res
  dmu, dsig = cot
  rows = x2d.shape[0]
  s = dsig + dsig.T
  # The R-row backward matmul follows the module-wide whitening precision
  # (--whitening_precision; HIGH default) like every other whitening-path
  # matmul — it was the one spot still pinned to HIGHEST (6-pass), and it
  # runs once per WC layer in the G backward (hot).
  dx = (jnp.matmul((x2d.astype(jnp.float32) - mean), s,
                   precision=whiten_ops._PRECISION)
        + dmu) / rows
  return (dx.astype(x2d.dtype),)


moments.defvjp(_moments_fwd, _moments_bwd)


# --- Full WC-apply kernel: Newton-Schulz + coloring fold + apply -------------


def _wc_apply_kernel(x_ref, mean_ref, cov_ref, gamma_ref, beta_ref,
                     out_ref, mt_scratch, bias_scratch, *,
                     ns_iters: int, eps: float, scaling: str):
  i = pl.program_id(0)

  @pl.when(i == 0)
  def _():
    # Whole Newton-Schulz solve in VMEM: cov is C x C (<=512) — the
    # iteration is ns_iters x 3 small MXU matmuls, done ONCE per kernel.
    cov = cov_ref[:].astype(jnp.float32)
    c = cov.shape[0]
    ident = jnp.eye(c, dtype=jnp.float32)
    # Full _spd_jitter parity (ADVICE r4 — the 2*neg_diag SPD-safety
    # term was missing here: a diagonal that rounds slightly negative
    # under MXU emulation keeps a negative eigenvalue, and NS then
    # diverges cubically). All diagonal ops stay FULL-2D reductions
    # over masked cov: jnp.diagonal gathers don't lower in Mosaic, and
    # a 1-D axis=1 row-sum trips a Mosaic relayout error on real TPU
    # ("non-singleton dimension replicated in destination", vector
    # <1xC> — measured r5, tests/test_tpu.py), so no 1-D intermediates.
    mean_diag = jnp.maximum(jnp.sum(cov * ident) / c, 0.0)
    min_diag = jnp.min(jnp.where(ident != 0.0, cov, jnp.inf))
    neg_diag = jnp.maximum(-min_diag, 0.0)
    a = cov + (eps * mean_diag + 2.0 * neg_diag + 1e-12) * ident
    # Same jitter AND convergence-normalization contract as
    # ops/whiten.py::_jittered_normalized ('trace' = IterNorm parity,
    # 'fro' = the measured faster-converging bound).
    if scaling == "trace":
      trace = jnp.sum(a * ident)
    else:
      trace = jnp.sqrt(jnp.sum(a * a))
    a = a / trace

    # HIGHEST precision is load-bearing: with the MXU's default bf16
    # passes Newton-Schulz plateaus at ~2e-2 error (measured both in
    # XLA, see ops/whiten.py, and inside this kernel: 6e-2 max err
    # before this annotation).
    hp = jax.lax.Precision.HIGHEST

    def body(_, yz):
      y, z = yz
      t = 1.5 * ident - 0.5 * jnp.dot(
          z, y, precision=hp, preferred_element_type=jnp.float32)
      return (jnp.dot(y, t, precision=hp,
                      preferred_element_type=jnp.float32),
              jnp.dot(t, z, precision=hp,
                      preferred_element_type=jnp.float32))

    _, z = jax.lax.fori_loop(0, ns_iters, body, (a, ident))
    w = z / jnp.sqrt(trace)                       # cov^{-1/2}
    m = jnp.dot(gamma_ref[:].astype(jnp.float32), w, precision=hp,
                preferred_element_type=jnp.float32)  # fold coloring
    mt_scratch[:] = m.T
    bias_scratch[:] = (beta_ref[:].astype(jnp.float32)
                       - jnp.dot(mean_ref[:].astype(jnp.float32), m.T,
                                 precision=hp,
                                 preferred_element_type=jnp.float32))

  xb = x_ref[:]
  out = jnp.dot(xb.astype(jnp.float32), mt_scratch[:],
                preferred_element_type=jnp.float32) + bias_scratch[:]
  out_ref[:] = out.astype(out_ref.dtype)


def whiten_color_apply(x2d: jax.Array, mean: jax.Array, cov: jax.Array,
                       gamma: jax.Array, beta: jax.Array,
                       ns_iters: int = 15, eps: float = 1e-5,
                       scaling: str = "trace",
                       block_rows: int = _DEF_BLOCK_ROWS,
                       interpret: Optional[bool] = None) -> jax.Array:
  """The WC transform given (mean, cov): ONE kernel computing the
  Newton-Schulz inverse square root, the coloring fold M = Gamma W and
  bias, and the row-block apply ``(x - mean) (Gamma W)^T + beta`` —
  covariance inverse-sqrt + coloring 1x1 in a single VMEM-resident pass
  (the north-star fusion). With running statistics this computes the
  whole inference-mode WC layer in one kernel; in training, pair with
  :func:`moments`. NOTE it is not the product default anywhere: both the
  training path (below) and the sampling path (bench_ablate.py
  --sampling: 10-20% slower than the split path at batch-256 G sampling,
  recorded in BASELINE.md) measured in favor of the XLA split design;
  models/layers.py forces it only under ``pallas_eval=True``.

  Forward-only; the training path uses the equivalent jnp fold
  (models/layers.py), which autodiff handles. Measured head-to-head on
  TPU v5e (R=16384, C=256, amortized over a 20-deep chain): this kernel
  268 us/apply with default-precision NS (but NS then plateaus at ~2e-2,
  the documented bf16-pass failure), 552 us with HIGHEST-precision NS;
  the XLA path (moments kernel + NS + fold in XLA) runs 345-362 us with
  full f32 NS accuracy — XLA schedules the 45 small sequential NS
  matmuls better than Mosaic here, so the split design remains the
  default and this kernel is the fully-fused alternative for
  stats-given/inference use. Returns out with x2d's dtype.
  """
  if interpret is None:
    interpret = not _on_tpu()
  rows, c = x2d.shape
  block_rows = min(block_rows, max(8, rows))
  nblocks = pl.cdiv(rows, block_rows)
  padded = nblocks * block_rows
  if padded != rows:
    x2d = jnp.pad(x2d, ((0, padded - rows), (0, 0)))
  if scaling not in ("trace", "fro"):
    raise ValueError(f"ns scaling must be 'trace' or 'fro', "
                     f"got {scaling!r}")
  kernel = functools.partial(_wc_apply_kernel, ns_iters=ns_iters, eps=eps,
                             scaling=scaling)
  try:
    vma = jax.typeof(x2d).vma
    out_shape = jax.ShapeDtypeStruct((padded, c), x2d.dtype, vma=vma)
  except (AttributeError, TypeError):
    out_shape = jax.ShapeDtypeStruct((padded, c), x2d.dtype)
  out = pl.pallas_call(
      kernel,
      grid=(nblocks,),
      in_specs=[pl.BlockSpec((block_rows, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((c, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec((block_rows, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=out_shape,
      scratch_shapes=[pltpu.VMEM((c, c), jnp.float32),
                      pltpu.VMEM((1, c), jnp.float32)],
      cost_estimate=pl.CostEstimate(
          flops=2 * padded * c * c + (3 * ns_iters + 2) * 2 * c ** 3,
          bytes_accessed=(padded * c * x2d.dtype.itemsize * 2
                          + 3 * 4 * c * c),
          transcendentals=0),
      # The i==0 grid step writes the folded (Gamma W) and bias into VMEM
      # scratch that every later step reads — the grid MUST execute
      # sequentially. True by default on TPU/Mosaic today; pinned here so
      # a future parallelizing scheduler can't break it (VERDICT r1).
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=("arbitrary",)),
      interpret=interpret,
  )(x2d, mean.reshape(1, c), cov, gamma, beta.reshape(1, c))
  return out[:rows]
