"""Train state: every stateful thing the reference mutates in-place,
made explicit so one XLA program can own the whole K-D+1-G update.

The reference scatters state across Keras internals: weights in two
``Model``s, two Adam slots, WC moving stats and SN ``u`` vectors updated
as side effects of forward passes (SURVEY.md §3.3). Here it is a single
pytree — jit-carryable, orbax-checkpointable in full (strictly stronger
than the reference's weights-only ``save_weights`` resume; SURVEY.md §5).

``g_state`` / ``d_state`` hold *all* non-param variable collections of the
respective module ('wc_stats' whitening EMAs, 'batch_stats' for the 'b'
norm code, 'spectral' SN power-iteration vectors) keyed by collection
name, so the step code is agnostic to which norm/SN combination a config
selects.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import optax


class GANTrainState(flax.struct.PyTreeNode):
  """All mutable training state for one GAN experiment."""

  step: jax.Array               # int32 scalar, counts OUTER steps
  g_params: Any
  d_params: Any
  g_opt: Any
  d_opt: Any
  g_state: Dict[str, Any]       # generator variable collections
  d_state: Dict[str, Any]       # discriminator variable collections
  g_ema: Any                    # EMA of g_params ({} when disabled)
  rng: jax.Array


def split_collections(variables) -> tuple:
  """(params, other-collections-as-plain-dict). Plain dicts throughout so
  pytree structure is stable across flax freeze/unfreeze conventions."""
  variables = flax.core.unfreeze(variables)
  params = variables.pop("params")
  return params, dict(variables)


def create_state(
    g_module,
    d_module,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    rng: jax.Array,
    batch_size: int,
    z_dim: int,
    image_shape,
    num_classes: int = 0,
    g_ema: bool = False,
) -> GANTrainState:
  """Initialize G/D variables and optimizer slots into one state pytree."""
  g_rng, d_rng, state_rng = jax.random.split(rng, 3)
  z = jnp.zeros((batch_size, z_dim), jnp.float32)
  x = jnp.zeros((batch_size,) + tuple(image_shape), jnp.float32)
  labels: Optional[jax.Array] = None
  if num_classes > 0:
    labels = jnp.zeros((batch_size,), jnp.int32)

  g_params, g_state = split_collections(
      g_module.init(g_rng, z, labels, train=True))
  d_params, d_state = split_collections(
      d_module.init(d_rng, x, labels, train=True))

  return GANTrainState(
      step=jnp.zeros((), jnp.int32),
      g_params=g_params,
      d_params=d_params,
      g_opt=g_tx.init(g_params),
      d_opt=d_tx.init(d_params),
      g_state=g_state,
      d_state=d_state,
      g_ema=jax.tree_util.tree_map(jnp.copy, g_params) if g_ema else {},
      rng=state_rng,
  )
