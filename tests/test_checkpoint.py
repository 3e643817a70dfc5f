"""Checkpoint/resume bit-exactness (SURVEY.md §4: resume from checkpoint
bit-exact for optimizer + stats + SN state — strictly stronger than the
reference's weights-only resume)."""

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from wcgan_tpu.models.discriminator import Discriminator, DiscriminatorConfig
from wcgan_tpu.models.generator import Generator, GeneratorConfig
from wcgan_tpu.train import schedules
from wcgan_tpu.train.state import create_state
from wcgan_tpu.train.step import GANConfig, make_jit_step

KEY = jax.random.PRNGKey(5)


def _setup():
  g = Generator(cfg=GeneratorConfig(z_dim=8, resolution=8,
                                    base_resolution=4, filters=(8,),
                                    ns_iters=6))
  d = Discriminator(cfg=DiscriminatorConfig(
      resolution=8, filters=(8, 8), downsample=(True, False), ns_iters=6))
  cfg = GANConfig(training_ratio=2, z_dim=8)
  g_tx = schedules.adam(2e-4, schedule="linear", total_steps=100)
  d_tx = schedules.adam(2e-4, schedule="linear", total_steps=200)
  state = create_state(g, d, g_tx, d_tx, KEY, batch_size=4, z_dim=8,
                       image_shape=(8, 8, 3))
  step = make_jit_step(g, d, g_tx, d_tx, cfg, donate=False)
  real = jax.random.uniform(KEY, (2, 4, 8, 8, 3), minval=-1, maxval=1)
  labels = jnp.zeros((2, 4), jnp.int32)
  return state, step, real, labels


def _assert_tree_equal(a, b):
  la = jax.tree_util.tree_leaves(a)
  lb = jax.tree_util.tree_leaves(b)
  assert len(la) == len(lb)
  for x, y in zip(la, lb):
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_full_state_roundtrip_and_bitexact_resume(tmp_path):
  state, step, real, labels = _setup()
  # Advance two steps, checkpoint.
  for _ in range(2):
    state, _ = step(state, real, labels)
  ckptr = ocp.StandardCheckpointer()
  path = str(tmp_path / "ck")
  ckptr.save(path, state, force=True)
  ckptr.wait_until_finished()

  # Continue two more steps from the live state...
  cont = state
  for _ in range(2):
    cont, _ = step(cont, real, labels)

  # ...and from the restored state: must match bit for bit (params, BOTH
  # Adam moment trees, WC moving stats, SN u vectors, rng, step).
  fresh_state, step2, _, _ = _setup()
  restored = ckptr.restore(path, fresh_state)
  _assert_tree_equal(restored, state)
  resumed = restored
  for _ in range(2):
    resumed, _ = step2(resumed, real, labels)
  _assert_tree_equal(resumed, cont)
