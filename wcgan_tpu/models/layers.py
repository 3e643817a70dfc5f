"""Flax layers: whitening norm, coloring, and spectral-normalized wrappers.

TPU-native re-design of the reference's custom Keras layers
(``conditional_layers.py::DecorelationNormalization / ConditionalConv11 /
ConditionalDense / ConditionalCenterScale / CenterScale`` and
``gan/spectral_normalized_layers.py::SNConv2D / SNDense / SNEmbeding`` [U];
citations per SURVEY.md §0 convention — upstream mount was empty, symbols
reconstructed). The Keras layers mutate state (moving stats, power-iteration
``u``) inside ``call``; here all state is explicit in flax variable
collections so a whole K-step train program jits as one pure function
(SURVEY.md §3.3 / §7 hard-part #4):

- ``params``    — learned weights.
- ``wc_stats``  — whitening moving mean / covariance (BN-style EMA).
- ``spectral``  — persistent power-iteration vectors.

Norm / coloring code vocabulary (mirrors the reference CLI's per-block code
strings [U]; spellings documented in cli/run.py):

  norm:     'n' none | 'b' batchnorm | 'd' whitening (batch stats)
            | 'dr' whitening (running stats)
  coloring: 'n' none | 's' scale-shift | 'ucs' uncond+cond scale-shift
            | 'ccs' conditional scale-shift | 'uconv' uncond 1x1
            | 'cconv' conditional 1x1 | 'ucconv' uncond+cond 1x1
            + '-sa' suffix on conditional convs for soft-assignment basis
              (cWC-sa, paper §4.1; K = filters_emb)
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from wcgan_tpu.ops import coloring as coloring_ops
from wcgan_tpu.ops import pallas_wc
from wcgan_tpu.ops import sn as sn_ops
from wcgan_tpu.ops import whiten as whiten_ops

Dtype = Any

_COND_CODES = ("cconv", "ucconv", "ccs", "ucs", "cconv-sa", "ucconv-sa")
NORM_CODES = ("n", "b", "d", "dr")
COLORING_CODES = ("n", "s", "ccs", "ucs", "uconv", "cconv", "ucconv",
                  "cconv-sa", "ucconv-sa")


def coloring_is_conditional(code: str) -> bool:
  return code in _COND_CODES


def _row_precision(dtype) -> Optional[lax.Precision]:
  """Precision for the folded row-apply matmuls, gated on activation
  dtype like ops/whiten.py::whiten_apply: bf16 activations run one
  native MXU pass (results round to bf16 anyway — 6 f32-emulation
  passes buy nothing); f32 activations keep HIGHEST so f32 runs keep
  reference-parity precision on the activation path (advisor r2)."""
  return None if dtype == jnp.bfloat16 else lax.Precision.HIGHEST


def _eye_init(key, shape, dtype):
  """Identity init for coloring filters: whitened input passes through
  unchanged at step 0 (stabilizes early training when Sigma is wild).
  One definition — the fused paths' cross-path checkpoint/equivalence
  contract depends on every coloring variant initializing identically."""
  del key
  return jnp.eye(shape[0], shape[1], dtype=dtype)


def _pallas_eval_ok(pallas_eval: Optional[bool], method: str) -> bool:
  """Gate for the fully-fused stats-given WC kernel
  (ops/pallas_wc.py::whiten_color_apply). Auto (None) = OFF: measured on
  the real chip (bench_ablate.py --sampling, batch-256 G sampling), the
  fused kernel is 10% slower in bf16 (27.0k vs 30.0k imgs/s) and 20%
  slower in f32 (21.0k vs 26.4k) than the XLA split path, because the
  split path folds ΓW once and applies rows in one bf16 MXU pass while
  the kernel applies rows at f32/HIGHEST inside VMEM. Same verdict as the
  r1 training-path measurement (ops/pallas_wc.py) — the kernel remains
  available (``pallas_eval=True``; interpreter off-TPU) as the oracle-
  tested single-pass variant, not the product default."""
  if pallas_eval:
    if method != "newton_schulz":
      # Forced mode must be honest: the kernel has no Cholesky solve, so
      # silently falling back would record split-path numbers as
      # "fused kernel" measurements.
      raise ValueError(
          f"pallas_eval=True requires method='newton_schulz' "
          f"(got {method!r}); the fused kernel has no Cholesky phase")
    return True
  return False


class DecorrelationNorm(nn.Module):
  """Full-covariance batch whitening (the WC transform's W half).

  Reference: ``conditional_layers.py::DecorelationNormalization`` [U],
  paper Eq. 2–4. Differences by design: inverse square root via
  Newton–Schulz matmuls (MXU) instead of Cholesky + triangular solve, and
  cross-replica moment ``pmean`` over ``axis_name`` for exact global-batch
  whitening statistics under data parallelism.

  mode 'd'  — whiten with this batch's statistics (training).
  mode 'dr' — whiten with the running statistics (still EMA-updating them
              from the batch): the reference's 'dr' variant [U].
  """

  momentum: float = 0.99
  eps: float = 1e-5
  ns_iters: int = 15
  mode: str = "d"
  method: str = "newton_schulz"  # or "cholesky" (oracle)
  ns_scaling: str = "trace"      # NS convergence normalization
                                 # (ops/whiten.py::_jittered_normalized)
  axis_name: Optional[str] = None
  pallas_eval: Optional[bool] = None  # None/False = XLA split path
                                      # (measured faster); True forces
                                      # the fused kernel

  @nn.compact
  def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
    c = x.shape[-1]
    r_mean = self.variable("wc_stats", "mean",
                           lambda: jnp.zeros((c,), jnp.float32))
    r_cov = self.variable("wc_stats", "cov",
                          lambda: jnp.eye(c, dtype=jnp.float32))
    x2d = x.reshape(-1, c)
    axis = None if self.is_initializing() else self.axis_name

    if not train:
      # Stats-given inference. pallas_eval=True forces the fused kernel
      # (NS solve + apply, one VMEM pass) with identity coloring; the
      # XLA path is the measured-faster default and the grad oracle.
      if _pallas_eval_ok(self.pallas_eval, self.method):
        out = pallas_wc.whiten_color_apply(
            x2d, r_mean.value, r_cov.value,
            jnp.eye(c, dtype=jnp.float32), jnp.zeros((c,), jnp.float32),
            ns_iters=self.ns_iters, eps=self.eps,
            scaling=self.ns_scaling)
      else:
        out = whiten_ops.whiten_eval(
            x2d, r_mean.value, r_cov.value, eps=self.eps,
            num_iters=self.ns_iters, method=self.method,
            scaling=self.ns_scaling)
      return out.reshape(x.shape)

    if self.mode == "d":
      out, new_mean, new_cov = whiten_ops.whiten_train(
          x2d, r_mean.value, r_cov.value, momentum=self.momentum,
          eps=self.eps, num_iters=self.ns_iters, axis_name=axis,
          method=self.method, scaling=self.ns_scaling)
    elif self.mode == "dr":
      bmean, bcov = whiten_ops.batch_moments(x2d, axis_name=axis)
      mean, stat_src, new_mean, new_cov = \
          whiten_ops.stats_select_and_ema(
              bmean, bcov, r_mean.value, r_cov.value,
              use_batch=False, momentum=self.momentum)
      out = whiten_ops.whiten_eval(
          x2d, mean, stat_src, eps=self.eps,
          num_iters=self.ns_iters, method=self.method,
          scaling=self.ns_scaling)
    else:
      raise ValueError(f"unknown whitening mode {self.mode!r}")

    if not self.is_initializing():
      r_mean.value = new_mean
      r_cov.value = new_cov
    return out.reshape(x.shape)


class NormLayer(nn.Module):
  """Dispatch on the norm code: 'n' / 'b' / 'd' / 'dr'.

  'b' is affine-less BatchNorm (the learned affine comes from the coloring
  layer, as in the reference where norm and coloring are separate per-block
  codes [U])."""

  code: str = "d"
  momentum: float = 0.99
  eps: float = 1e-5
  ns_iters: int = 15
  method: str = "newton_schulz"
  ns_scaling: str = "trace"
  axis_name: Optional[str] = None
  pallas_eval: Optional[bool] = None

  @nn.compact
  def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
    if self.code == "n":
      return x
    if self.code == "b":
      return nn.BatchNorm(
          use_running_average=not train, momentum=self.momentum,
          epsilon=self.eps, use_bias=False, use_scale=False,
          axis_name=None if self.is_initializing() else self.axis_name,
          name="bn")(x)
    if self.code in ("d", "dr"):
      return DecorrelationNorm(
          momentum=self.momentum, eps=self.eps, ns_iters=self.ns_iters,
          mode=self.code, method=self.method,
          ns_scaling=self.ns_scaling, axis_name=self.axis_name,
          pallas_eval=self.pallas_eval, name="wc")(x, train=train)
    raise ValueError(f"unknown norm code {self.code!r}")


def _as_nsc(x: jax.Array) -> jax.Array:
  """(N, ..., C) -> (N, S, C): per-image row blocks for conditional ops."""
  return x.reshape(x.shape[0], -1, x.shape[-1])


class Coloring(nn.Module):
  """Learned coloring Γx̂+β — all variants behind one code string.

  Reference: the coloring half of the WC block
  (``ConditionalConv11`` / ``ConditionalCenterScale`` / ``CenterScale``
  [U], paper Eq. 5 and §4.1 for the '-sa' soft-assignment factorization).
  1×1 convs over NHWC are computed as matmuls over flattened
  (N·H·W, C) rows — the MXU-native formulation.
  """

  code: str = "uconv"
  num_classes: int = 0
  filters_emb: int = 10  # K basis filters for '-sa' (--filters_emb [U])
  param_dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, x: jax.Array,
               labels: Optional[jax.Array] = None) -> jax.Array:
    code = self.code
    if code == "n":
      return x
    c = x.shape[-1]
    pd = self.param_dtype
    if coloring_is_conditional(code):
      if labels is None:
        raise ValueError(f"coloring code {code!r} requires labels")
      if self.num_classes <= 0:
        raise ValueError("conditional coloring requires num_classes > 0")

    if code == "s":
      gamma = self.param("gamma", nn.initializers.ones, (c,), pd)
      beta = self.param("beta", nn.initializers.zeros, (c,), pd)
      return coloring_ops.center_scale(x, gamma, beta)

    if code in ("ccs", "ucs"):
      # 'ucs' SUMS the two branches — the 'uncond + cond' convention,
      # matching the conv analogue 'ucconv'. The conditional branch is a
      # zero-init delta (like ucconv's gamma_c near-zero init) so the
      # block is identity at step 0; pure-conditional 'ccs' keeps the
      # ones init since it is the whole transform.
      cond_scale_init = (nn.initializers.zeros if code == "ucs"
                         else nn.initializers.ones)
      gamma_c = self.param("gamma_c", cond_scale_init,
                           (self.num_classes, c), pd)
      beta_c = self.param("beta_c", nn.initializers.zeros,
                          (self.num_classes, c), pd)
      x3d = _as_nsc(x)
      out = coloring_ops.conditional_center_scale(x3d, labels,
                                                  gamma_c, beta_c)
      if code == "ucs":
        gamma = self.param("gamma", nn.initializers.ones, (c,), pd)
        beta = self.param("beta", nn.initializers.zeros, (c,), pd)
        out = out + coloring_ops.center_scale(x3d, gamma, beta)
      return out.reshape(x.shape)

    # 1x1-conv family; identity init via the shared _eye_init.
    x3d = _as_nsc(x)
    out = None
    if code in ("uconv", "ucconv", "ucconv-sa"):
      gamma_a = self.param("gamma_a", _eye_init, (c, c), pd)
      beta_a = self.param("beta_a", nn.initializers.zeros, (c,), pd)
      out = coloring_ops.color_uncond(x3d, gamma_a, beta_a)
    if code in ("cconv", "ucconv"):
      gamma_c = self.param("gamma_c", nn.initializers.normal(stddev=0.02),
                           (self.num_classes, c, c), pd)
      beta_c = self.param("beta_c", nn.initializers.zeros,
                          (self.num_classes, c), pd)
      cond = coloring_ops.color_cond(x3d, labels, gamma_c, beta_c)
      if code == "cconv":
        # Pure-conditional: identity skip so the near-zero-init class
        # filters start as identity coloring (stable early training).
        out = cond + x3d
      else:
        out = out + cond
    if code in ("cconv-sa", "ucconv-sa"):
      basis = self.param("basis", nn.initializers.normal(stddev=0.02),
                         (self.filters_emb, c, c), pd)
      emb = self.param("embedding", nn.initializers.ones,
                       (self.num_classes, self.filters_emb), pd)
      beta_c = self.param("beta_c", nn.initializers.zeros,
                          (self.num_classes, c), pd)
      cond = coloring_ops.color_cond_sa(x3d, labels, basis, emb, beta_c)
      if code == "cconv-sa":
        cond = cond + x3d  # identity skip
        out = cond
      else:
        out = out + cond
    if out is None:
      raise ValueError(f"unknown coloring code {code!r}")
    return out.reshape(x.shape)


class NormColor(nn.Module):
  """The full WC block: norm code + coloring code, reference-style pairing.

  This is the unit the reference inserts before every activation in G
  (``blocks.py::resblock(norm=..., coloring=...)`` [U]).

  Hot-path fusion: for whitening + unconditional 1x1 coloring (the
  paper's headline WC config) the two R-row matmuls
  ``x_hat = (x - mu) W^T`` and ``out = x_hat Gamma^T + beta`` fold
  algebraically into ONE: ``out = (x - mu) (Gamma W)^T + beta`` — the
  C x C fold is negligible, and the (N*H*W)-sized intermediate never
  exists. Conditional colorings need x_hat per-row and use the general
  path."""

  norm: str = "d"
  coloring: str = "uconv"
  num_classes: int = 0
  filters_emb: int = 10
  momentum: float = 0.99
  eps: float = 1e-5
  ns_iters: int = 15
  method: str = "newton_schulz"
  ns_scaling: str = "trace"
  axis_name: Optional[str] = None
  pallas_eval: Optional[bool] = None  # None/False = XLA split path
                                      # (measured faster); True forces
                                      # the fused kernel

  @nn.compact
  def __call__(self, x: jax.Array, labels: Optional[jax.Array] = None,
               train: bool = True) -> jax.Array:
    if self.norm in ("d", "dr") and self.coloring == "uconv":
      return self._fused_wc_uconv(x, train)
    if (self.norm in ("d", "dr") and self.coloring in
        ("cconv", "ucconv", "cconv-sa", "ucconv-sa")):
      return self._fused_wc_cond(x, labels, train)
    x = NormLayer(code=self.norm, momentum=self.momentum, eps=self.eps,
                  ns_iters=self.ns_iters, method=self.method,
                  ns_scaling=self.ns_scaling,
                  axis_name=self.axis_name, pallas_eval=self.pallas_eval,
                  name="norm")(x, train=train)
    x = Coloring(code=self.coloring, num_classes=self.num_classes,
                 filters_emb=self.filters_emb, name="color")(x, labels)
    return x

  def _wc_stats(self, x2d: jax.Array, train: bool):
    """Whitening statistics + EMA updates shared by the fused paths:
    returns (mean, stat_src) — the transform's source moments per the
    'd'/'dr' semantics (ops/whiten.py::stats_select_and_ema, the single
    encoding of that contract) — after updating the running stats."""
    c = x2d.shape[-1]
    r_mean = self.variable("wc_stats", "mean",
                           lambda: jnp.zeros((c,), jnp.float32))
    r_cov = self.variable("wc_stats", "cov",
                          lambda: jnp.eye(c, dtype=jnp.float32))
    if not train:
      return r_mean.value, r_cov.value
    axis = None if self.is_initializing() else self.axis_name
    batch_mean, batch_cov = whiten_ops.batch_moments(x2d, axis_name=axis)
    mean, stat_src, new_mean, new_cov = \
        whiten_ops.stats_select_and_ema(
            batch_mean, batch_cov, r_mean.value, r_cov.value,
            use_batch=self.mode_uses_batch, momentum=self.momentum)
    if not self.is_initializing():
      r_mean.value = new_mean
      r_cov.value = new_cov
    return mean, stat_src

  def _w(self, stat_src: jax.Array) -> jax.Array:
    if self.method == "cholesky":
      return whiten_ops.cholesky_inv_sqrt(stat_src, eps=self.eps)
    return whiten_ops.newton_schulz_inv_sqrt(
        stat_src, num_iters=self.ns_iters, eps=self.eps,
        scaling=self.ns_scaling)

  def _fused_wc_uconv(self, x: jax.Array, train: bool) -> jax.Array:
    c = x.shape[-1]
    gamma = self.param("gamma", _eye_init, (c, c), jnp.float32)
    beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)

    x2d = x.reshape(-1, c)
    mean, stat_src = self._wc_stats(x2d, train)
    if not train and _pallas_eval_ok(self.pallas_eval, self.method):
      # Forced-on fused kernel (NS inverse sqrt + Gamma-fold + row
      # apply, one VMEM pass). Not the default: measured slower than
      # the split path on-chip — see _pallas_eval_ok.
      out = pallas_wc.whiten_color_apply(
          x2d, mean, stat_src, gamma, beta,
          ns_iters=self.ns_iters, eps=self.eps,
          scaling=self.ns_scaling)
      return out.astype(x.dtype).reshape(x.shape)

    w = self._w(stat_src)
    m = jnp.matmul(gamma, w,
                   precision=lax.Precision.HIGHEST)          # (C, C) fold
    bias = beta - jnp.matmul(mean, m.T,
                             precision=lax.Precision.HIGHEST)
    out = (jnp.matmul(x2d, m.T.astype(x.dtype),
                      precision=_row_precision(x.dtype))
           + bias.astype(x.dtype))
    return out.reshape(x.shape)

  def _fused_wc_cond(self, x: jax.Array, labels: Optional[jax.Array],
                     train: bool) -> jax.Array:
    """Whitening + conditional coloring with the W-fold done per IMAGE.

    The general path whitens every row in f32/HIGHEST and then colors
    every row again (two to three R-row matmuls, 6-pass each); here the
    per-image coloring matrix G_i (class filter [+ agnostic branch, +
    identity skip for the pure-conditional codes]) is folded with the
    whitening matrix ONCE per image — M_i = G_i W is a C^3 matmul, ~C/S
    of one row pass — and the rows see a single bf16 MXU matmul, exactly
    like the unconditional fold. Measured: see BASELINE.md (r2
    conditional fold ablation). Same math as NormLayer+Coloring
    (tests/test_models.py oracle check); parameter names/inits mirror
    ``Coloring`` so the learned transform is identical."""
    if labels is None:
      raise ValueError(f"coloring code {self.coloring!r} requires labels")
    if self.num_classes <= 0:
      raise ValueError("conditional coloring requires num_classes > 0")
    c = x.shape[-1]
    pd = jnp.float32

    agnostic = self.coloring in ("ucconv", "ucconv-sa")
    if agnostic:
      gamma_a = self.param("gamma_a", _eye_init, (c, c), pd)
      beta_a = self.param("beta_a", nn.initializers.zeros, (c,), pd)
    if self.coloring in ("cconv", "ucconv"):
      gamma_c = self.param("gamma_c", nn.initializers.normal(stddev=0.02),
                           (self.num_classes, c, c), pd)
      g_img = gamma_c[labels]                            # (N, C, C)
    else:                                                # '-sa'
      basis = self.param("basis", nn.initializers.normal(stddev=0.02),
                         (self.filters_emb, c, c), pd)
      emb = self.param("embedding", nn.initializers.ones,
                       (self.num_classes, self.filters_emb), pd)
      # This K-contraction dot lowers on the TPU backend as a
      # window={size=C pad=(C-1)_(C-1) rhs_reversal=1} convolution over
      # a length-1 lhs spatial dim. That looks pathological (511/512
      # window taps are padding at C=512) but is measured FASTER than
      # the alternative: forcing a flat (N,K)x(K,C*C) GEMM via
      # matmul+optimization_barrier re-lowered cfg4 at 108.5 ms/step vs
      # 101.1 ms for this form (r5 on-chip A/B; BASELINE.md) — a K=10
      # contraction runs the 128-deep MXU at ~8% while the conv form
      # contracts over the C-wide window, and the hardware does not pay
      # for the padded taps (XLA cost_analysis counts valid taps only
      # and its count is consistent with the measured step time).
      g_img = jnp.einsum("nk,koc->noc", emb[labels], basis,
                         precision=lax.Precision.HIGHEST)
    beta_c = self.param("beta_c", nn.initializers.zeros,
                        (self.num_classes, c), pd)
    # Combined per-image coloring: class branch + (agnostic | identity
    # skip) — matches Coloring's 'ucconv'/'cconv' composition exactly.
    g_img = g_img + (gamma_a if agnostic else jnp.eye(c, dtype=pd))
    b_img = beta_c[labels] + (beta_a if agnostic else 0.0)   # (N, C)

    x3d = _as_nsc(x)
    mean, stat_src = self._wc_stats(x.reshape(-1, c), train)
    w = self._w(stat_src)
    # Row-apply precision mirrors whiten_apply's dtype gate: bf16
    # activations get the single native MXU pass (the fold's whole point);
    # f32 activations keep HIGHEST — reference-parity precision on the
    # activation path, same as the general NormLayer+Coloring route.
    rp = _row_precision(x.dtype)
    if x3d.shape[1] >= c:
      # Enough rows per image to amortize the C^3 fold: ONE bf16 row pass.
      m_img = jnp.einsum("noc,ce->noe", g_img, w,
                         precision=lax.Precision.HIGHEST)  # per-image fold
      bias = b_img - jnp.einsum("c,noc->no", mean, m_img,
                                precision=lax.Precision.HIGHEST)
      out = jnp.einsum("nsc,noc->nso", x3d, m_img.astype(x.dtype),
                       precision=rp)
    else:
      # Low-res blocks (S < C): the fold itself would dominate — apply W
      # then G_i as two bf16 row passes instead (same activation-level
      # bf16 noise as the folded matmul).
      bias_w = -jnp.matmul(mean, w.T, precision=lax.Precision.HIGHEST)
      xh = (jnp.matmul(x3d, w.T.astype(x.dtype), precision=rp)
            + bias_w.astype(x.dtype))
      out = jnp.einsum("nsc,noc->nso", xh, g_img.astype(x.dtype),
                       precision=rp)
      bias = b_img
    out = out + bias.astype(x.dtype)[:, None, :]
    return out.reshape(x.shape)

  @property
  def mode_uses_batch(self) -> bool:
    return self.norm == "d"


# --- Spectral-normalized wrappers -------------------------------------------


class SNDense(nn.Module):
  """Dense layer with spectral-normalized kernel (``SNDense`` [U])."""

  features: int
  use_bias: bool = True
  sn_iters: int = 1
  fully_diff: bool = False
  dtype: Optional[Dtype] = None
  param_dtype: Dtype = jnp.float32
  kernel_init: Any = nn.initializers.glorot_uniform()

  @nn.compact
  def __call__(self, x: jax.Array, update_sn: bool = False) -> jax.Array:
    kernel = self.param("kernel", self.kernel_init,
                        (x.shape[-1], self.features), self.param_dtype)
    # Fixed-key u init (as in SNConv/SNEmbed): the power iteration
    # converges from any nonzero start, so a deterministic init keeps
    # layers reproducible without threading an extra RNG stream.
    u = self.variable(
        "spectral", "u",
        lambda: jax.random.normal(jax.random.PRNGKey(0),
                                  (self.features,), jnp.float32))
    w_bar, u_new = sn_ops.spectral_normalize(
        kernel, u.value, n_iters=self.sn_iters, fully_diff=self.fully_diff)
    if update_sn and not self.is_initializing():
      u.value = u_new
    y = jnp.matmul(x, w_bar.astype(x.dtype))
    if self.use_bias:
      bias = self.param("bias", nn.initializers.zeros,
                        (self.features,), self.param_dtype)
      y = y + bias.astype(y.dtype)
    return y


class SNConv(nn.Module):
  """2-D conv with spectral-normalized kernel (``SNConv2D`` [U]).

  ``conv_singular=True`` estimates σ of the conv *operator* (power
  iteration through conv / conv-transpose) instead of the reshaped-kernel
  matrix (``--conv_singular`` [U])."""

  features: int
  kernel_size: Tuple[int, int] = (3, 3)
  strides: Tuple[int, int] = (1, 1)
  padding: str = "SAME"
  use_bias: bool = True
  sn_iters: int = 1
  fully_diff: bool = False
  conv_singular: bool = False
  dtype: Optional[Dtype] = None
  param_dtype: Dtype = jnp.float32
  kernel_init: Any = nn.initializers.glorot_uniform()

  @nn.compact
  def __call__(self, x: jax.Array, update_sn: bool = False) -> jax.Array:
    kh, kw = self.kernel_size
    cin = x.shape[-1]
    kernel = self.param("kernel", self.kernel_init,
                        (kh, kw, cin, self.features), self.param_dtype)
    if self.conv_singular:
      u_map = self.variable(
          "spectral", "u_map",
          lambda: jax.random.normal(
              jax.random.PRNGKey(0), (1,) + x.shape[1:], jnp.float32))
      sigma, u_new = sn_ops.conv_power_iteration(
          kernel, u_map.value, strides=self.strides, padding=self.padding,
          n_iters=self.sn_iters, fully_diff=self.fully_diff)
      w_bar = kernel / sigma.astype(kernel.dtype)
      if update_sn and not self.is_initializing():
        u_map.value = u_new
    else:
      u = self.variable(
          "spectral", "u",
          lambda: jax.random.normal(
              jax.random.PRNGKey(0), (self.features,), jnp.float32))
      w_bar, u_new = sn_ops.spectral_normalize(
          kernel, u.value, n_iters=self.sn_iters, fully_diff=self.fully_diff)
      if update_sn and not self.is_initializing():
        u.value = u_new

    dn = lax.conv_dimension_numbers(x.shape, w_bar.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        x, w_bar.astype(x.dtype), window_strides=self.strides,
        padding=self.padding, dimension_numbers=dn)
    if self.use_bias:
      bias = self.param("bias", nn.initializers.zeros,
                        (self.features,), self.param_dtype)
      y = y + bias.astype(y.dtype)
    return y


class SNEmbed(nn.Module):
  """Spectral-normalized embedding (``SNEmbeding`` [U]) — projection-D's
  class embedding ψ(y) with σ(W)-normalized embedding matrix."""

  num_classes: int
  features: int
  sn_iters: int = 1
  fully_diff: bool = False
  param_dtype: Dtype = jnp.float32

  @nn.compact
  def __call__(self, labels: jax.Array, update_sn: bool = False) -> jax.Array:
    table = self.param("embedding", nn.initializers.glorot_uniform(),
                       (self.num_classes, self.features), self.param_dtype)
    u = self.variable(
        "spectral", "u",
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (self.features,), jnp.float32))
    w_bar, u_new = sn_ops.spectral_normalize(
        table, u.value, n_iters=self.sn_iters, fully_diff=self.fully_diff)
    if update_sn and not self.is_initializing():
      u.value = u_new
    return jnp.take(w_bar, labels, axis=0)


class Conv(nn.Module):
  """Plain conv with the same call signature as SNConv (ignores update_sn),
  so blocks can swap SN on/off via a single class switch."""

  features: int
  kernel_size: Tuple[int, int] = (3, 3)
  strides: Tuple[int, int] = (1, 1)
  padding: str = "SAME"
  use_bias: bool = True
  dtype: Optional[Dtype] = None
  param_dtype: Dtype = jnp.float32
  kernel_init: Any = nn.initializers.glorot_uniform()

  @nn.compact
  def __call__(self, x: jax.Array, update_sn: bool = False) -> jax.Array:
    del update_sn
    return nn.Conv(
        features=self.features, kernel_size=self.kernel_size,
        strides=self.strides, padding=self.padding, use_bias=self.use_bias,
        dtype=self.dtype, param_dtype=self.param_dtype,
        kernel_init=self.kernel_init, name="conv")(x)


class Dense(nn.Module):
  """Plain dense with SNDense-compatible call signature."""

  features: int
  use_bias: bool = True
  dtype: Optional[Dtype] = None
  param_dtype: Dtype = jnp.float32
  kernel_init: Any = nn.initializers.glorot_uniform()

  @nn.compact
  def __call__(self, x: jax.Array, update_sn: bool = False) -> jax.Array:
    del update_sn
    return nn.Dense(
        features=self.features, use_bias=self.use_bias, dtype=self.dtype,
        param_dtype=self.param_dtype, kernel_init=self.kernel_init,
        name="dense")(x)


def upsample_nearest(x: jax.Array, factor: int = 2) -> jax.Array:
  """Nearest-neighbor 2x upsample as reshape+broadcast (layout-friendly;
  avoids gather-based ``jax.image.resize`` on TPU)."""
  n, h, w, c = x.shape
  x = jnp.broadcast_to(x[:, :, None, :, None, :],
                       (n, h, factor, w, factor, c))
  return x.reshape(n, h * factor, w * factor, c)


def downsample_avg(x: jax.Array, factor: int = 2) -> jax.Array:
  """2x average pool (the reference's down-resample [U])."""
  n, h, w, c = x.shape
  x = x.reshape(n, h // factor, factor, w // factor, factor, c)
  return jnp.mean(x, axis=(2, 4))


def global_sum_pool(x: jax.Array) -> jax.Array:
  """Global sum pool over H, W (SN-GAN D head convention)."""
  return jnp.sum(x, axis=(1, 2))
