"""GAN objectives: hinge / non-saturating / WGAN (+ gradient penalty, AC aux).

Reimplements the loss surface of the reference's compile layer
(``gan/gan.py`` loss fns for 'ns'/'hinge'/'wgan', ``gan/wgan_gp.py``
gradient-penalty builder, ``gan/ac_gan.py`` auxiliary classifier terms [U])
as pure functions of discriminator scores — ready to drop into a jitted
value_and_grad train step.

Conventions: ``real_scores`` / ``fake_scores`` are raw (pre-sigmoid) D
outputs of shape (N,) or (N, 1). All losses are means over the batch.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


# --- Discriminator losses ---------------------------------------------------

def hinge_d_loss(real_scores: jax.Array, fake_scores: jax.Array) -> jax.Array:
  """E[relu(1 - D(x))] + E[relu(1 + D(G(z)))]  (``gan/gan.py`` hinge [U])."""
  return (jnp.mean(jax.nn.relu(1.0 - real_scores))
          + jnp.mean(jax.nn.relu(1.0 + fake_scores)))


def ns_d_loss(real_scores: jax.Array, fake_scores: jax.Array) -> jax.Array:
  """Non-saturating (standard) GAN D loss with logits."""
  real = jnp.mean(jax.nn.softplus(-real_scores))
  fake = jnp.mean(jax.nn.softplus(fake_scores))
  return real + fake


def wgan_d_loss(real_scores: jax.Array, fake_scores: jax.Array) -> jax.Array:
  """Wasserstein critic loss: E[D(G(z))] - E[D(x)]."""
  return jnp.mean(fake_scores) - jnp.mean(real_scores)


# --- Generator losses --------------------------------------------------------

def hinge_g_loss(fake_scores: jax.Array) -> jax.Array:
  """-E[D(G(z))] — hinge G loss (same as WGAN G)."""
  return -jnp.mean(fake_scores)


def ns_g_loss(fake_scores: jax.Array) -> jax.Array:
  """Non-saturating G loss: -E[log sigmoid(D(G(z)))]."""
  return jnp.mean(jax.nn.softplus(-fake_scores))


wgan_g_loss = hinge_g_loss


D_LOSSES = {"hinge": hinge_d_loss, "ns": ns_d_loss, "wgan": wgan_d_loss,
            "wgan-gp": wgan_d_loss}
G_LOSSES = {"hinge": hinge_g_loss, "ns": ns_g_loss, "wgan": wgan_g_loss,
            "wgan-gp": wgan_g_loss}


def get_losses(name: str) -> Tuple[Callable, Callable]:
  """(d_loss_fn, g_loss_fn) for a loss name from the reference's ``--loss``."""
  if name not in D_LOSSES:
    raise ValueError(f"unknown loss {name!r}; choose from {sorted(D_LOSSES)}")
  return D_LOSSES[name], G_LOSSES[name]


# --- Gradient penalty (WGAN-GP) ----------------------------------------------

def gradient_penalty(
    d_apply: Callable[[jax.Array], jax.Array],
    real: jax.Array,
    fake: jax.Array,
    rng: jax.Array,
    weight: float = 10.0,
) -> jax.Array:
  """lambda * E[(||grad_x_hat D(x_hat)||_2 - 1)^2] on interpolates.

  x_hat = eps*x + (1-eps)*G(z) with eps ~ U[0,1] per sample
  (``gan/wgan_gp.py`` [U]; default weight = --gradient_penalty_weight = 10).
  ``d_apply`` must map a batch of images to per-sample scores.
  """
  eps_shape = (real.shape[0],) + (1,) * (real.ndim - 1)
  eps = jax.random.uniform(rng, eps_shape, dtype=real.dtype)
  x_hat = eps * real + (1.0 - eps) * fake

  def per_sample_sum(x):
    return jnp.sum(d_apply(x))

  grads = jax.grad(per_sample_sum)(x_hat)
  norms = jnp.sqrt(
      jnp.sum(jnp.square(grads.astype(jnp.float32)),
              axis=tuple(range(1, grads.ndim))) + 1e-12)
  return weight * jnp.mean(jnp.square(norms - 1.0))


# --- AC-GAN auxiliary classifier ----------------------------------------------

def ac_gan_aux_loss(class_logits: jax.Array, labels: jax.Array) -> jax.Array:
  """Cross-entropy on D's auxiliary classifier head (``gan/ac_gan.py`` [U]).

  Added to the D loss on real images and to the G loss on generated images.
  """
  logp = jax.nn.log_softmax(class_logits.astype(jnp.float32), axis=-1)
  return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
