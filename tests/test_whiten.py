"""Unit tests for whitening numerics (SURVEY.md §4 unit/numerics plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wcgan_tpu.ops import whiten


def _random_features(rng, r=4096, c=64, scale=3.0):
  # Correlated features with a white-noise floor: x = z @ A^T + n + mu.
  # The floor keeps cond(cov) realistic (~1e2-1e3, like real activations);
  # without it random A A^T reaches cond ~1e6 where the epsilon jitter
  # dominates lambda_min and W Sigma W^T - I is bounded by eps/lambda_min
  # rather than solver accuracy.
  a = rng.standard_normal((c, c)).astype(np.float32)
  z = rng.standard_normal((r, c)).astype(np.float32)
  noise = rng.standard_normal((r, c)).astype(np.float32)
  mu = (scale * rng.standard_normal((c,))).astype(np.float32)
  return z @ a.T + noise + mu


def test_batch_moments_match_numpy(rng):
  x = _random_features(rng, r=1024, c=32)
  mean, cov = whiten.batch_moments(jnp.asarray(x))
  np.testing.assert_allclose(np.asarray(mean), x.mean(0), rtol=1e-4, atol=1e-4)
  np.testing.assert_allclose(
      np.asarray(cov), np.cov(x, rowvar=False, bias=True),
      rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("c", [16, 64, 128])
def test_newton_schulz_inverse_sqrt(rng, c):
  x = _random_features(rng, r=8 * c, c=c)
  _, cov = whiten.batch_moments(jnp.asarray(x))
  w = whiten.newton_schulz_inv_sqrt(cov, num_iters=30)
  ident = np.asarray(w @ cov @ w.T)
  # f32 floor scales with cond(cov) — random full C x C covariances here
  # reach cond ~1e6 at C=128 (measured ~2.5e-3 residual at convergence).
  np.testing.assert_allclose(ident, np.eye(c), atol=1e-2)


def _spd_with_cond(rng, c, cond):
  q, _ = np.linalg.qr(rng.standard_normal((c, c)).astype(np.float32))
  eigs = np.exp(np.linspace(0.0, -np.log(cond), c)).astype(np.float32)
  return jnp.asarray((q * eigs) @ q.T)


@pytest.mark.parametrize("cond", [1e2, 1e4])
def test_ns_fro_scaling_whitens_and_dominates_trace(rng, cond):
  """'fro' scaling at the shipped 15 iterations: whitens correctly
  (matches the Cholesky oracle's W Sigma W^T = I contract), and its
  residual is never worse than 'trace' — with a decisive margin at high
  conditioning, where trace's spectrum over-shrink leaves the iteration
  under-converged (the measured r4 calibration this knob ships on)."""
  cov = _spd_with_cond(rng, 64, cond)

  def resid(w):
    return float(jnp.max(jnp.abs(w @ cov @ w.T - jnp.eye(64))))

  r_fro = resid(whiten.newton_schulz_inv_sqrt(cov, num_iters=15,
                                              scaling="fro"))
  r_tr = resid(whiten.newton_schulz_inv_sqrt(cov, num_iters=15,
                                             scaling="trace"))
  r_orc = resid(whiten.cholesky_inv_sqrt(cov))
  assert r_fro <= r_tr * 1.05  # never worse (small f32 slack)
  assert r_fro <= max(10 * r_orc, 5e-3)  # actually whitens
  if cond >= 1e4:
    assert r_fro < 0.2 * r_tr  # the high-cond margin is real


def test_ns_fro_does_not_license_fewer_iterations(rng):
  """Negative result, pinned (r4 calibration, docs/SOAK.md): 'fro'
  scaling does NOT make ns_iters < 15 safe. On a SPIKED spectrum (one
  dominant eigenvalue — the shape live WC covariances take, per the
  soak conditioning/residual data) tr(A) is dominated by that
  eigenvalue so tr ~= ||A||_F: fro buys nothing, and dropping
  iterations under-converges as badly as under trace (measured C=256:
  fro@13 is 66x worse than trace@15 at cond 1e4). Iteration count
  stays the sharp axis regardless of scaling — keep ns_iters >= 15."""
  c = 64
  q, _ = np.linalg.qr(rng.standard_normal((c, c)).astype(np.float32))
  eigs = np.full(c, 1e-4, np.float32)
  eigs[0] = 1.0  # spiked: cond 1e4 carried by one eigenvalue
  cov = jnp.asarray((q * eigs) @ q.T)

  def resid(k, s):
    w = whiten.newton_schulz_inv_sqrt(cov, num_iters=k, scaling=s)
    return float(jnp.max(jnp.abs(w @ cov @ w.T - jnp.eye(c))))

  r_fro15, r_tr15 = resid(15, "fro"), resid(15, "trace")
  # No fro advantage on spiked spectra (tr ~= fro norm here)...
  assert r_fro15 <= r_tr15 * 1.10
  # ...and two fewer iterations under fro loses an order of magnitude.
  assert resid(13, "fro") > 10 * r_fro15


def test_ns_scaling_rejects_unknown():
  cov = jnp.eye(4)
  with pytest.raises(ValueError, match="scaling"):
    whiten.newton_schulz_inv_sqrt(cov, scaling="spectral")


def test_newton_schulz_matches_cholesky_whitening(rng):
  # Different W factors (NS gives the symmetric root, Cholesky the
  # triangular one) but both must whiten: W Sigma W^T = I.
  x = _random_features(rng, r=2048, c=48)
  _, cov = whiten.batch_moments(jnp.asarray(x))
  for w in (whiten.newton_schulz_inv_sqrt(cov, num_iters=20),
            whiten.cholesky_inv_sqrt(cov)):
    ident = np.asarray(w @ cov @ w.T)
    np.testing.assert_allclose(ident, np.eye(48), atol=5e-3)


def test_newton_schulz_sqrt_roundtrip(rng):
  x = _random_features(rng, r=2048, c=32)
  _, cov = whiten.batch_moments(jnp.asarray(x))
  s = whiten.newton_schulz_sqrt(cov, num_iters=25)
  np.testing.assert_allclose(np.asarray(s @ s), np.asarray(cov),
                             rtol=2e-2, atol=2e-2)


def test_whitened_output_is_white(rng):
  """Property test: whitened features have mean ~0 and covariance ~I."""
  x = jnp.asarray(_random_features(rng, r=4096, c=64))
  mm = jnp.zeros((64,))
  mc = jnp.eye(64)
  out, _, _ = whiten.whiten_train(x, mm, mc, num_iters=20)
  mean, cov = whiten.batch_moments(out)
  np.testing.assert_allclose(np.asarray(mean), np.zeros(64), atol=1e-3)
  np.testing.assert_allclose(np.asarray(cov), np.eye(64), atol=1e-2)


def test_moving_stats_ema(rng):
  x = jnp.asarray(_random_features(rng, r=1024, c=16))
  mm = jnp.ones((16,))
  mc = 2.0 * jnp.eye(16)
  _, new_mm, new_mc = whiten.whiten_train(x, mm, mc, momentum=0.9)
  mean, cov = whiten.batch_moments(x)
  np.testing.assert_allclose(np.asarray(new_mm),
                             0.9 * np.ones(16) + 0.1 * np.asarray(mean),
                             rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(np.asarray(new_mc),
                             0.9 * 2.0 * np.eye(16) + 0.1 * np.asarray(cov),
                             rtol=1e-5, atol=1e-5)


def test_whiten_eval_uses_running_stats(rng):
  x = jnp.asarray(_random_features(rng, r=2048, c=16))
  mean, cov = whiten.batch_moments(x)
  out = whiten.whiten_eval(x, mean, cov, num_iters=20)
  m2, c2 = whiten.batch_moments(out)
  np.testing.assert_allclose(np.asarray(m2), np.zeros(16), atol=1e-3)
  np.testing.assert_allclose(np.asarray(c2), np.eye(16), atol=1e-2)


def test_whiten_gradients_finite(rng):
  x = jnp.asarray(_random_features(rng, r=512, c=16))

  def loss(x):
    out, _, _ = whiten.whiten_train(x, jnp.zeros(16), jnp.eye(16))
    return jnp.sum(out ** 2)

  g = jax.grad(loss)(x)
  assert np.isfinite(np.asarray(g)).all()


def test_constant_and_zero_inputs_stay_finite(rng):
  """Regression: constant rows once NaN'd via catastrophic cancellation in
  the one-pass covariance (negative diagonal rounding junk -> NS diverged).
  """
  c = 32
  const = jnp.asarray(
      np.tile(rng.standard_normal((1, c)).astype(np.float32), (256, 1)))
  for x in (const, jnp.zeros((256, c))):
    out, _, _ = whiten.whiten_train(x, jnp.zeros(c), jnp.eye(c))
    assert np.isfinite(np.asarray(out)).all()


def test_inv_sqrt_finite_on_negative_rounded_covariance():
  """Regression (core review r3, twice): a covariance whose diagonal
  rounds negative (near-constant features under MXU emulation) NaN'd
  first the Cholesky oracle (fixed 89585a6) and then — caught by a
  second review pass — the DEFAULT Newton–Schulz path, whose jitter
  lacked the neg-diag compensation. BOTH methods must stay finite, on
  the pure-negative and the mixed +/- diagonal shapes."""
  c = 8
  mixed = np.eye(c, dtype=np.float32) * 1e-9
  mixed[0, 0] = -5e-8
  cases = [jnp.asarray(-s * np.eye(c, dtype=np.float32))
           for s in (1e-12, 1e-9, 1e-7)] + [jnp.asarray(mixed)]
  for cov in cases:
    for method in ("cholesky", "newton_schulz"):
      w = whiten.inv_sqrt(cov, method=method)
      assert np.isfinite(np.asarray(w)).all(), (method, np.asarray(cov))


def test_large_mean_cancellation_regime(rng):
  """mu >> sigma: the regime where E[xx^T] - mu mu^T loses all precision."""
  c = 32
  x = jnp.asarray(
      (rng.standard_normal((512, c)) * 0.01 + 1000.0).astype(np.float32))
  out, _, _ = whiten.whiten_train(x, jnp.zeros(c), jnp.eye(c), num_iters=20)
  mean, cov = whiten.batch_moments(out)
  np.testing.assert_allclose(np.asarray(mean), np.zeros(c), atol=2e-2)
  np.testing.assert_allclose(np.asarray(cov), np.eye(c), atol=2e-2)


def test_ill_conditioned_covariance(rng):
  """Early-training regime: near-singular covariance must not blow up."""
  # Rank-deficient features (c=32 but only 4 effective dims).
  z = rng.standard_normal((1024, 4)).astype(np.float32)
  proj = rng.standard_normal((4, 32)).astype(np.float32)
  x = jnp.asarray(z @ proj)
  out, _, _ = whiten.whiten_train(
      x, jnp.zeros(32), jnp.eye(32), eps=1e-3, num_iters=20)
  assert np.isfinite(np.asarray(out)).all()


def test_set_precision_switch(rng):
  """--whitening_precision plumbing: 'high' still whitens correctly (on
  CPU both modes are exact f32 — this exercises the switch + cache
  clearing + validation, the numerics trade is measured on TPU in
  ops/whiten.py's docstring)."""
  c = 16
  x = jnp.asarray(rng.standard_normal((512, c)).astype(np.float32) * 3)
  try:
    whiten.set_precision("high")
    out, _, _ = whiten.whiten_train(x, jnp.zeros(c), jnp.eye(c))
    mean, cov = whiten.batch_moments(out)
    np.testing.assert_allclose(np.asarray(mean), np.zeros(c), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cov), np.eye(c), atol=1e-3)
    with pytest.raises(ValueError):
      whiten.set_precision("bf16")
  finally:
    whiten.set_precision("high")  # restore the product default


def test_whiten_apply_bf16_single_pass(rng):
  """bf16 activations take the one-pass bf16 row matmul; it must agree
  with the f32 path to bf16 tolerance (the output is bf16 either way)."""
  c = 16
  x = rng.standard_normal((256, c)).astype(np.float32) * 2 + 1
  mean, cov = whiten.batch_moments(jnp.asarray(x))
  w = whiten.newton_schulz_inv_sqrt(cov)
  ref = whiten.whiten_apply(jnp.asarray(x), mean, w)
  out = whiten.whiten_apply(jnp.asarray(x, jnp.bfloat16), mean, w)
  assert out.dtype == jnp.bfloat16
  np.testing.assert_allclose(np.asarray(out, np.float32),
                             np.asarray(ref), atol=0.15, rtol=0.05)
