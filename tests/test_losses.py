"""Unit tests for GAN losses against hand-computed small cases."""

import jax
import jax.numpy as jnp
import numpy as np

from wcgan_tpu.ops import losses


def test_hinge_d_loss_hand_case():
  real = jnp.asarray([2.0, 0.5])   # relu(1-2)=0, relu(0.5)=0.5 -> mean 0.25
  fake = jnp.asarray([-2.0, 0.0])  # relu(1-2)=0, relu(1+0)=1  -> mean 0.5
  np.testing.assert_allclose(float(losses.hinge_d_loss(real, fake)), 0.75)


def test_hinge_g_loss_hand_case():
  fake = jnp.asarray([1.0, 3.0])
  np.testing.assert_allclose(float(losses.hinge_g_loss(fake)), -2.0)


def test_ns_losses_match_sigmoid_ce():
  real = jnp.asarray([0.3, -1.2])
  fake = jnp.asarray([0.7, 2.0])
  d = float(losses.ns_d_loss(real, fake))
  expected = (-np.log(1 / (1 + np.exp(-np.asarray(real))))).mean() + \
             (-np.log(1 - 1 / (1 + np.exp(-np.asarray(fake))))).mean()
  np.testing.assert_allclose(d, expected, rtol=1e-3)
  g = float(losses.ns_g_loss(fake))
  expected_g = (-np.log(1 / (1 + np.exp(-np.asarray(fake))))).mean()
  np.testing.assert_allclose(g, expected_g, rtol=1e-3)


def test_wgan_losses():
  real = jnp.asarray([1.0, 2.0])
  fake = jnp.asarray([0.5, 0.5])
  np.testing.assert_allclose(float(losses.wgan_d_loss(real, fake)), -1.0)
  np.testing.assert_allclose(float(losses.wgan_g_loss(fake)), -0.5)


def test_gradient_penalty_zero_for_unit_gradient():
  """D(x) = sum(x) has gradient exactly 1 in 1-D per sample -> GP = 0."""
  def d_apply(x):
    return jnp.sum(x.reshape(x.shape[0], -1), axis=1)

  real = jnp.ones((4, 1))
  fake = jnp.zeros((4, 1))
  gp = losses.gradient_penalty(d_apply, real, fake, jax.random.key(0),
                               weight=10.0)
  np.testing.assert_allclose(float(gp), 0.0, atol=1e-5)


def test_gradient_penalty_positive_otherwise():
  def d_apply(x):
    return jnp.sum(2.0 * x.reshape(x.shape[0], -1), axis=1)

  real = jnp.ones((4, 3))
  fake = jnp.zeros((4, 3))
  gp = losses.gradient_penalty(d_apply, real, fake, jax.random.key(0))
  # |grad| = 2*sqrt(3) per sample -> 10*(2*sqrt(3)-1)^2
  expected = 10.0 * (2 * np.sqrt(3) - 1) ** 2
  np.testing.assert_allclose(float(gp), expected, rtol=1e-4)


def test_ac_gan_aux_loss():
  logits = jnp.asarray([[10.0, 0.0], [0.0, 10.0]])
  labels = jnp.asarray([0, 1])
  assert float(losses.ac_gan_aux_loss(logits, labels)) < 1e-3
  wrong = jnp.asarray([1, 0])
  assert float(losses.ac_gan_aux_loss(logits, wrong)) > 5.0


def test_get_losses_registry():
  for name in ("hinge", "ns", "wgan", "wgan-gp"):
    d, g = losses.get_losses(name)
    assert callable(d) and callable(g)
  try:
    losses.get_losses("nope")
    raise AssertionError("should have raised")
  except ValueError:
    pass
