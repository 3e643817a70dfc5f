"""Fused Pallas moment kernel vs the pure-jnp oracle (SURVEY.md §7 step 2:
keep the jnp path as the correctness oracle)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from wcgan_tpu.ops import pallas_wc, whiten
from wcgan_tpu.parallel import DATA_AXIS, make_mesh


@pytest.mark.parametrize("rows,c,block", [(512, 16, 128), (1000, 32, 256),
                                          (64, 8, 128), (130, 16, 64)])
def test_moments_match_oracle(rows, c, block, rng):
  x = jnp.asarray(rng.standard_normal((rows, c)).astype(np.float32) * 2 + 3)
  mean_p, cov_p = pallas_wc.moments(x, block, True)
  mean_j, cov_j = whiten.batch_moments(x, use_pallas=False)
  np.testing.assert_allclose(np.asarray(mean_p), np.asarray(mean_j),
                             atol=1e-4)
  np.testing.assert_allclose(np.asarray(cov_p), np.asarray(cov_j),
                             atol=1e-4)


def test_moments_bf16_input(rng):
  x = jnp.asarray(rng.standard_normal((256, 16)).astype(np.float32))
  mean_p, cov_p = pallas_wc.moments(x.astype(jnp.bfloat16), 128, True)
  assert mean_p.dtype == jnp.float32 and cov_p.dtype == jnp.float32
  mean_j, cov_j = whiten.batch_moments(x, use_pallas=False)
  np.testing.assert_allclose(np.asarray(mean_p), np.asarray(mean_j),
                             atol=3e-2)
  np.testing.assert_allclose(np.asarray(cov_p), np.asarray(cov_j),
                             atol=3e-2)


def test_moments_large_mean_regime(rng):
  """Two-pass semantics survive |mu| >> sigma inside the kernel."""
  x = jnp.asarray((rng.standard_normal((512, 16)) * 0.01 + 1000.0
                   ).astype(np.float32))
  _, cov_p = pallas_wc.moments(x, 128, True)
  diag = np.diag(np.asarray(cov_p))
  assert (diag >= 0).all()
  np.testing.assert_allclose(diag, 1e-4 * np.ones(16), rtol=0.2)


def test_moments_gradient_matches_oracle(rng):
  x = jnp.asarray(rng.standard_normal((256, 12)).astype(np.float32))
  w = jnp.asarray(rng.standard_normal((12, 12)).astype(np.float32))

  def loss_pallas(x):
    mean, cov = pallas_wc.moments(x, 64, True)
    return jnp.sum(cov * w) + jnp.sum(mean ** 2)

  def loss_jnp(x):
    mean, cov = whiten.batch_moments(x, use_pallas=False)
    return jnp.sum(cov * w) + jnp.sum(mean ** 2)

  g_p = jax.grad(loss_pallas)(x)
  g_j = jax.grad(loss_jnp)(x)
  np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_j), atol=1e-4)


def test_batch_moments_pallas_crossreplica(rng):
  """Local-mean-centered kernel + parallel-variance combination ==
  global-batch moments (the DP invariant for the pallas path)."""
  mesh = make_mesh()
  x = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32) * 3 + 1)

  fn = functools.partial(whiten.batch_moments, axis_name=DATA_AXIS,
                         use_pallas=True)
  # Force interpret inside: monkey, simpler — pallas auto-detects CPU and
  # interprets, so just run under shard_map.
  sharded = jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=P(DATA_AXIS),
                                  out_specs=P()))
  mean_s, cov_s = sharded(x)
  mean_g, cov_g = whiten.batch_moments(x, use_pallas=False)
  np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean_g),
                             atol=1e-5)
  np.testing.assert_allclose(np.asarray(cov_s), np.asarray(cov_g),
                             atol=1e-5)


def test_whiten_train_with_pallas_moments(rng):
  """whiten_train's auto path composes with the pallas kernel (interpret
  on CPU) and still whitens."""
  x = jnp.asarray(rng.standard_normal((512, 16)).astype(np.float32))
  mean, cov = whiten.batch_moments(x, use_pallas=True)
  w = whiten.newton_schulz_inv_sqrt(cov)
  out = whiten.whiten_apply(x, mean, w)
  m2, c2 = whiten.batch_moments(out, use_pallas=False)
  np.testing.assert_allclose(np.asarray(m2), np.zeros(16), atol=1e-4)
  np.testing.assert_allclose(np.asarray(c2), np.eye(16), atol=1e-3)


def test_whiten_color_apply_matches_composition(rng):
  """Single-kernel NS+fold+apply == whiten.inv_sqrt -> color composition."""
  from wcgan_tpu.ops import coloring
  c = 16
  x = jnp.asarray(rng.standard_normal((300, c)).astype(np.float32) * 2 + 1)
  mean, cov = whiten.batch_moments(x, use_pallas=False)
  gamma = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.3)
  beta = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))

  for scaling in ("trace", "fro"):
    out = pallas_wc.whiten_color_apply(x, mean, cov, gamma, beta,
                                       ns_iters=14, scaling=scaling,
                                       interpret=True)
    w = whiten.newton_schulz_inv_sqrt(cov, num_iters=14, scaling=scaling)
    ref = coloring.color_uncond(whiten.whiten_apply(x, mean, w),
                                gamma, beta)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, err_msg=scaling)


def test_whiten_color_apply_negative_diagonal_jitter_parity(rng):
  """ADVICE r4: the kernel's jitter must carry _spd_jitter's 2*neg_diag
  SPD-safety term. A covariance whose diagonal rounds slightly negative
  (the measured ~1e-9..1e-7 MXU-emulation artifact on near-constant
  features) must whiten finitely and match the whiten-ops composition,
  not diverge cubically in Newton-Schulz."""
  from wcgan_tpu.ops import coloring
  c = 8
  x = jnp.asarray(rng.standard_normal((200, c)).astype(np.float32))
  mean, cov = whiten.batch_moments(x, use_pallas=False)
  # Make one feature near-constant with a negative rounded variance and
  # junk covariances of the same magnitude (the documented artifact).
  cov = np.array(cov)
  cov[0, :] = cov[:, 0] = 1e-8 * rng.standard_normal(c)
  cov[0, 0] = -3e-8
  cov = jnp.asarray(cov)
  out = pallas_wc.whiten_color_apply(x, mean, cov, jnp.eye(c),
                                     jnp.zeros(c), ns_iters=15,
                                     interpret=True)
  assert np.isfinite(np.asarray(out)).all()
  w = whiten.newton_schulz_inv_sqrt(cov, num_iters=15)
  ref = whiten.whiten_apply(x, mean, w)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4)


def test_whiten_color_apply_ragged_rows(rng):
  c = 8
  x = jnp.asarray(rng.standard_normal((130, c)).astype(np.float32))
  mean, cov = whiten.batch_moments(x, use_pallas=False)
  out = pallas_wc.whiten_color_apply(x, mean, cov, jnp.eye(c),
                                     jnp.zeros(c), block_rows=64,
                                     interpret=True)
  assert out.shape == (130, c)
  m2, c2 = whiten.batch_moments(out, use_pallas=False)
  np.testing.assert_allclose(np.asarray(m2), np.zeros(c), atol=1e-4)
  np.testing.assert_allclose(np.asarray(c2), np.eye(c), atol=2e-3)


def test_model_eval_paths_use_pallas_and_match_jnp(rng):
  """VERDICT r1 item 3: the fused kernel is wired into the stats-given
  eval paths of DecorrelationNorm and NormColor(d,uconv). Force it on
  (interpreter off-TPU) and check against the jnp oracle path."""
  import flax
  from wcgan_tpu.models.layers import DecorrelationNorm, NormColor
  c = 16
  x = jnp.asarray(rng.standard_normal((4, 3, 3, c)).astype(np.float32))
  # Non-trivial running stats: moments of a correlated sample.
  s = jnp.asarray(rng.standard_normal((200, c)).astype(np.float32))
  s = s @ jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * .3)
  mean, cov = whiten.batch_moments(s + 0.7, use_pallas=False)

  for make in (lambda pe: DecorrelationNorm(ns_iters=14, pallas_eval=pe),
               lambda pe: NormColor(norm="d", coloring="uconv",
                                    ns_iters=14, pallas_eval=pe)):
    mod_p, mod_j = make(True), make(False)
    variables = flax.core.unfreeze(mod_j.init(jax.random.PRNGKey(0), x))
    variables["wc_stats"] = {"mean": mean, "cov": cov}
    out_p = mod_p.apply(variables, x, train=False)
    out_j = mod_j.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_j),
                               atol=5e-4)
