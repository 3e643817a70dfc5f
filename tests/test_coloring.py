"""Unit tests for coloring transforms.

Conditional ops take (N, S, C) with one label per image; these tests use
S=1 so each "image" is a single row (the per-class selection semantics
are then directly checkable row by row)."""


def _n1c(x):
  return x[:, None, :]  # (N, C) -> (N, 1, C)


import jax
import jax.numpy as jnp
import numpy as np

from wcgan_tpu.ops import coloring


def test_color_uncond_is_affine(rng):
  x = jnp.asarray(rng.standard_normal((64, 8)).astype(np.float32))
  gamma = jnp.asarray(rng.standard_normal((8, 8)).astype(np.float32))
  beta = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
  out = coloring.color_uncond(x, gamma, beta)
  np.testing.assert_allclose(
      np.asarray(out), np.asarray(x) @ np.asarray(gamma).T + np.asarray(beta),
      rtol=1e-5, atol=1e-5)


def test_color_cond_selects_class_filter(rng):
  n_cls, c = 3, 4
  x = jnp.asarray(rng.standard_normal((10, c)).astype(np.float32))
  labels = jnp.asarray(rng.integers(0, n_cls, size=10))
  gamma_c = jnp.asarray(rng.standard_normal((n_cls, c, c)).astype(np.float32))
  beta_c = jnp.asarray(rng.standard_normal((n_cls, c)).astype(np.float32))
  out = coloring.color_cond(_n1c(x), labels, gamma_c, beta_c)[:, 0]
  for i in range(10):
    y = int(labels[i])
    expected = np.asarray(gamma_c)[y] @ np.asarray(x)[i] + np.asarray(beta_c)[y]
    np.testing.assert_allclose(np.asarray(out)[i], expected,
                               rtol=1e-4, atol=1e-4)


def test_color_cond_agnostic_branch_sums(rng):
  """Paper Eq. 5: class-specific + class-agnostic branches are summed."""
  n_cls, c = 2, 4
  x = jnp.asarray(rng.standard_normal((6, c)).astype(np.float32))
  labels = jnp.zeros((6,), jnp.int32)
  gamma_c = jnp.asarray(rng.standard_normal((n_cls, c, c)).astype(np.float32))
  beta_c = jnp.zeros((n_cls, c))
  gamma_a = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32))
  beta_a = jnp.zeros((c,))
  combined = coloring.color_cond(_n1c(x), labels, gamma_c, beta_c,
                                 gamma_a, beta_a)[:, 0]
  cls_only = coloring.color_cond(_n1c(x), labels, gamma_c, beta_c)[:, 0]
  agn_only = coloring.color_uncond(x, gamma_a, beta_a)
  np.testing.assert_allclose(np.asarray(combined),
                             np.asarray(cls_only) + np.asarray(agn_only),
                             rtol=1e-4, atol=1e-4)


def test_color_cond_sa_equals_materialized(rng):
  """cWC-sa must equal explicitly materialized Gamma^c = sum_k A[y,k] G_k."""
  n_cls, k, c = 5, 3, 4
  x = jnp.asarray(rng.standard_normal((12, c)).astype(np.float32))
  labels = jnp.asarray(rng.integers(0, n_cls, size=12))
  basis = jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32))
  emb = jnp.asarray(rng.standard_normal((n_cls, k)).astype(np.float32))
  beta = jnp.asarray(rng.standard_normal((n_cls, c)).astype(np.float32))
  out = coloring.color_cond_sa(_n1c(x), labels, basis, emb, beta)[:, 0]
  gamma_full = np.einsum("yk,koc->yoc", np.asarray(emb), np.asarray(basis))
  for i in range(12):
    y = int(labels[i])
    expected = gamma_full[y] @ np.asarray(x)[i] + np.asarray(beta)[y]
    np.testing.assert_allclose(np.asarray(out)[i], expected,
                               rtol=1e-4, atol=1e-4)


def test_conditional_center_scale(rng):
  x = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))
  labels = jnp.asarray([0, 1] * 4)
  gamma = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
  beta = jnp.asarray(rng.standard_normal((2, 4)).astype(np.float32))
  out = coloring.conditional_center_scale(_n1c(x), labels, gamma,
                                          beta)[:, 0]
  expected = (np.asarray(x) * np.asarray(gamma)[np.asarray(labels)]
              + np.asarray(beta)[np.asarray(labels)])
  np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


def test_coloring_gradients(rng):
  """Gradcheck the sa path (the trickiest einsum chain)."""
  n_cls, k, c = 3, 2, 4
  x = jnp.asarray(rng.standard_normal((6, c)).astype(np.float32))
  labels = jnp.asarray(rng.integers(0, n_cls, size=6))
  basis = jnp.asarray(rng.standard_normal((k, c, c)).astype(np.float32))
  emb = jnp.asarray(rng.standard_normal((n_cls, k)).astype(np.float32))
  beta = jnp.zeros((n_cls, c))

  def loss(basis, emb):
    return jnp.sum(
        coloring.color_cond_sa(_n1c(x), labels, basis, emb, beta) ** 2)

  g_basis, g_emb = jax.grad(loss, argnums=(0, 1))(basis, emb)
  # Finite-difference check on one coordinate of each.
  epsv = 1e-3
  for (g, arr, idx) in ((g_basis, basis, (0, 1, 2)), (g_emb, emb, (1, 0))):
    bumped = arr.at[idx].add(epsv)
    if arr is basis:
      fd = (loss(bumped, emb) - loss(arr, emb)) / epsv
    else:
      fd = (loss(basis, bumped) - loss(basis, arr)) / epsv
    np.testing.assert_allclose(float(g[idx]), float(fd), rtol=5e-2, atol=5e-2)


def test_ucs_layer_sums_branches_and_is_identity_at_init(rng):
  """ADVICE r1: 'ucs' must SUM the uncond and cond scale-shift branches
  (the 'uncond+cond' convention of 'ucconv'), and — like 'ucconv' — be
  identity at init (zero-init conditional delta)."""
  from wcgan_tpu.models.layers import Coloring
  x = jnp.asarray(rng.standard_normal((5, 2, 2, 4)).astype(np.float32))
  labels = jnp.asarray(rng.integers(0, 3, size=5))
  layer = Coloring(code="ucs", num_classes=3)
  variables = layer.init(jax.random.PRNGKey(0), x, labels)
  np.testing.assert_allclose(np.asarray(layer.apply(variables, x, labels)),
                             np.asarray(x), rtol=1e-6)
  # Perturb every param; output == cond branch + uncond branch, summed.
  p = jax.tree_util.tree_map(
      lambda a: a + 0.1 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape),
      variables["params"])
  out = layer.apply({"params": p}, x, labels)
  gc = np.asarray(p["gamma_c"])[np.asarray(labels)][:, None, None, :]
  bc = np.asarray(p["beta_c"])[np.asarray(labels)][:, None, None, :]
  expect = (np.asarray(x) * gc + bc) + (
      np.asarray(x) * np.asarray(p["gamma"]) + np.asarray(p["beta"]))
  np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)
