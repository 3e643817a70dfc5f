"""Spectral normalization as pure functions.

Reimplements the reference's SN wrappers
(``gan/spectral_normalized_layers.py::SNConv2D / SNDense / SNEmbeding`` [U];
Miyato et al. 2018) in functional JAX style: the persistent power-iteration
vector ``u`` is explicit state — ``(W, u) -> (W_bar, u')`` — threaded through
the jitted train step instead of mutated inside a Keras forward pass
(SURVEY.md §3.3 / §7 hard-part #4).

Flags mirrored from the reference CLI [U]:
- ``spectral_iterations`` (default 1): power-iteration steps per forward.
- ``fully_diff_spectral``: backprop through the iteration (no stop_gradient
  on u/v) instead of treating u, v as constants.
- ``conv_singular``: estimate sigma of the *conv operator* (power iteration
  alternating conv / conv-transpose) instead of the reshaped kernel matrix.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_HIGHEST = lax.Precision.HIGHEST


def _l2_normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
  return v * lax.rsqrt(jnp.sum(jnp.square(v)) + eps)


@functools.partial(jax.jit, static_argnames=("n_iters", "fully_diff"))
def power_iteration(
    w2d: jax.Array,
    u: jax.Array,
    n_iters: int = 1,
    fully_diff: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
  """One-or-more power-iteration steps on a 2-D matrix.

  Args:
    w2d: (rows, cols) matrix (kernel reshaped to (out, in*kh*kw) style).
    u:   (rows,) persistent left singular vector estimate.
  Returns:
    (sigma, u_new, v): spectral-norm estimate and updated vectors. ``u_new``
    must be persisted by the caller (flax 'spectral' collection) — the
    reference updates it as a side effect of each training forward [U].
  """
  if n_iters < 1:
    # n_iters=0 would leave v at its zeros init => sigma=0 => kernel/0
    # NaNs the whole discriminator on step 1 (models review r3).
    raise ValueError("power_iteration needs n_iters >= 1 (v starts at "
                     "zeros; 0 iterations would give sigma = 0)")
  w = w2d.astype(jnp.float32)
  u = u.astype(jnp.float32)

  def body(_, uv):
    u_c, _ = uv
    v_c = _l2_normalize(jnp.matmul(u_c, w, precision=_HIGHEST))
    u_c = _l2_normalize(jnp.matmul(w, v_c, precision=_HIGHEST))
    return u_c, v_c

  u_new, v = lax.fori_loop(
      0, n_iters, body, (u, jnp.zeros((w.shape[1],), jnp.float32)))
  if not fully_diff:
    u_new = lax.stop_gradient(u_new)
    v = lax.stop_gradient(v)
  sigma = jnp.einsum("i,ij,j->", u_new, w, v, precision=_HIGHEST)
  return sigma, u_new, v


@functools.partial(jax.jit, static_argnames=("n_iters", "fully_diff"))
def spectral_normalize(
    kernel: jax.Array,
    u: jax.Array,
    n_iters: int = 1,
    fully_diff: bool = False,
) -> Tuple[jax.Array, jax.Array]:
  """Normalize an arbitrary-rank kernel by its reshaped-matrix sigma.

  Follows the reference/Miyato convention: a conv kernel (kh, kw, cin, cout)
  is reshaped to (prod(leading), cout) and sigma is estimated for that
  matrix; ``u`` has shape (cout,) — the small side — matching
  ``SNConv2D`` [U].
  Returns (kernel / sigma, u_new).
  """
  cout = kernel.shape[-1]
  w2d = kernel.reshape(-1, cout).T  # (cout, rest)
  sigma, u_new, _ = power_iteration(w2d, u, n_iters=n_iters,
                                    fully_diff=fully_diff)
  w_bar = kernel / sigma.astype(kernel.dtype)
  return w_bar, u_new.astype(u.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("strides", "padding", "n_iters", "fully_diff"))
def conv_power_iteration(
    kernel: jax.Array,
    u_map: jax.Array,
    strides: Sequence[int] = (1, 1),
    padding: str = "SAME",
    n_iters: int = 1,
    fully_diff: bool = False,
) -> Tuple[jax.Array, jax.Array]:
  """Spectral norm of the *convolution operator* (``--conv_singular`` [U]).

  Power iteration alternates the conv and its transpose on a persistent
  input-shaped map ``u_map`` of shape (1, H, W, C_in). Returns
  (sigma, u_map_new). More faithful to the true operator norm than the
  reshaped-matrix bound; costs one extra conv pair per step.
  """
  if n_iters < 1:
    # Mirrors power_iteration's guard: with 0 iterations sigma is taken
    # on the raw (unnormalized) u_map init, overestimating by ~||u_map||
    # and silently deadening the discriminator (review r3).
    raise ValueError("conv_power_iteration needs n_iters >= 1")
  k = kernel.astype(jnp.float32)
  dn = lax.conv_dimension_numbers(u_map.shape, k.shape,
                                  ("NHWC", "HWIO", "NHWC"))

  def fwd(x):
    return lax.conv_general_dilated(
        x, k, window_strides=tuple(strides), padding=padding,
        dimension_numbers=dn, precision=_HIGHEST)

  def body(_, u_c):
    v_c = fwd(u_c)
    v_c = v_c * lax.rsqrt(jnp.sum(jnp.square(v_c)) + 1e-12)
    # Transpose conv = VJP of the forward conv at this v.
    u_next = jax.vjp(fwd, u_c)[1](v_c)[0]
    return u_next * lax.rsqrt(jnp.sum(jnp.square(u_next)) + 1e-12)

  u_new = lax.fori_loop(0, n_iters, body, u_map.astype(jnp.float32))
  if not fully_diff:
    u_new = lax.stop_gradient(u_new)
  sigma = jnp.sqrt(jnp.sum(jnp.square(fwd(u_new))) + 1e-12)
  return sigma, u_new.astype(u_map.dtype)
