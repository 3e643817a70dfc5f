"""Unit tests for spectral normalization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wcgan_tpu.ops import sn


def test_power_iteration_converges_to_svd(rng):
  w = jnp.asarray(rng.standard_normal((32, 48)).astype(np.float32))
  u = jnp.asarray(rng.standard_normal((32,)).astype(np.float32))
  sigma, u, _ = sn.power_iteration(w, u, n_iters=100)
  true_sigma = np.linalg.svd(np.asarray(w), compute_uv=False)[0]
  np.testing.assert_allclose(float(sigma), true_sigma, rtol=1e-4)


def test_one_step_iteration_improves_monotonically(rng):
  """The reference does 1 step per forward; sigma estimate must grow
  toward the true value across persisted-u steps."""
  w = jnp.asarray(rng.standard_normal((16, 16)).astype(np.float32))
  u = jnp.asarray(rng.standard_normal((16,)).astype(np.float32))
  true_sigma = np.linalg.svd(np.asarray(w), compute_uv=False)[0]
  prev = -np.inf
  for _ in range(50):
    sigma, u, _ = sn.power_iteration(w, u, n_iters=1)
    assert float(sigma) >= prev - 1e-4
    prev = float(sigma)
  np.testing.assert_allclose(prev, true_sigma, rtol=1e-3)


def test_spectral_normalize_unit_norm(rng):
  kernel = jnp.asarray(rng.standard_normal((3, 3, 16, 32)).astype(np.float32))
  u = jnp.asarray(rng.standard_normal((32,)).astype(np.float32))
  for _ in range(50):
    w_bar, u = sn.spectral_normalize(kernel, u)
  sigma_bar = np.linalg.svd(
      np.asarray(w_bar).reshape(-1, 32), compute_uv=False)[0]
  np.testing.assert_allclose(sigma_bar, 1.0, rtol=1e-3)


def test_u_is_stop_gradiented_by_default(rng):
  w = jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32))
  u = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))

  def sigma_of(w, fully_diff):
    s, _, _ = sn.power_iteration(w, u, n_iters=2, fully_diff=fully_diff)
    return s

  g_default = jax.grad(sigma_of)(w, False)
  g_full = jax.grad(sigma_of)(w, True)
  assert np.isfinite(np.asarray(g_default)).all()
  assert np.isfinite(np.asarray(g_full)).all()
  # fully-diff backprops through the iteration -> different gradient.
  assert not np.allclose(np.asarray(g_default), np.asarray(g_full))


def test_conv_power_iteration_vs_dense_operator(rng):
  """conv_singular sigma must match the largest SV of the materialized
  conv operator on a small problem."""
  kernel = jnp.asarray(rng.standard_normal((3, 3, 2, 3)).astype(np.float32))
  h = w_ = 5
  u_map = jnp.asarray(rng.standard_normal((1, h, w_, 2)).astype(np.float32))
  sigma, u_map2 = sn.conv_power_iteration(kernel, u_map, n_iters=200)

  # Materialize the operator: apply conv to each basis vector.
  import jax.lax as lax
  dn = lax.conv_dimension_numbers((1, h, w_, 2), kernel.shape,
                                  ("NHWC", "HWIO", "NHWC"))
  def fwd(x):
    return lax.conv_general_dilated(x, kernel, (1, 1), "SAME",
                                    dimension_numbers=dn)
  dim_in = h * w_ * 2
  mat = np.zeros((h * w_ * 3, dim_in), np.float32)
  for i in range(dim_in):
    e = np.zeros((dim_in,), np.float32)
    e[i] = 1.0
    mat[:, i] = np.asarray(fwd(jnp.asarray(e.reshape(1, h, w_, 2)))).ravel()
  true_sigma = np.linalg.svd(mat, compute_uv=False)[0]
  np.testing.assert_allclose(float(sigma), true_sigma, rtol=1e-2)
  assert u_map2.shape == u_map.shape


def test_power_iteration_rejects_zero_iters():
  """n_iters=0 would return sigma=0 from the zeros-init v and NaN the
  normalized kernel on step 1; the guard makes it loud (late r3)."""
  with pytest.raises(ValueError, match="n_iters"):
    sn.power_iteration(jnp.eye(4), jnp.zeros((4,)), n_iters=0)


def test_conv_power_iteration_rejects_zero_iters():
  with pytest.raises(ValueError, match="n_iters"):
    sn.conv_power_iteration(jnp.zeros((3, 3, 2, 4)),
                            jnp.zeros((1, 8, 8, 2)), n_iters=0)
