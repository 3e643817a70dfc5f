"""Fused outer-step tests: single-device, variants, and the fake-mesh
data-parallel invariants (SURVEY.md §4)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from wcgan_tpu.models.discriminator import Discriminator, DiscriminatorConfig
from wcgan_tpu.models.generator import Generator, GeneratorConfig
from wcgan_tpu.ops import whiten
from wcgan_tpu.parallel import DATA_AXIS, make_mesh
from wcgan_tpu.train import schedules
from wcgan_tpu.train.state import create_state
from wcgan_tpu.train.step import (GANConfig, make_jit_step,
                                  make_outer_step, make_sharded_step)

KEY = jax.random.PRNGKey(42)
RES = 8
ZDIM = 8


def build(num_classes=0, projection=False, ac_gan=False, loss="hinge",
          gp=0.0, axis_name=None, d_norm="n", g_norm="d"):
  gcfg = GeneratorConfig(
      z_dim=ZDIM, resolution=RES, base_resolution=4, filters=(8,),
      block_norm=g_norm, block_coloring="uconv", last_norm=g_norm,
      last_coloring="uconv", num_classes=num_classes, ns_iters=6,
      axis_name=axis_name)
  dcfg = DiscriminatorConfig(
      resolution=RES, filters=(8, 8), downsample=(True, False),
      num_classes=num_classes, projection=projection, ac_gan=ac_gan,
      norm=d_norm, ns_iters=6, axis_name=axis_name)
  g, d = Generator(cfg=gcfg), Discriminator(cfg=dcfg)
  cfg = GANConfig(loss=loss,
                  gan_type=("projection" if projection else
                            "acgan" if ac_gan else "gan"),
                  training_ratio=2, generator_batch_multiple=2,
                  gradient_penalty_weight=gp, num_classes=num_classes,
                  z_dim=ZDIM)
  g_tx = schedules.adam(2e-4)
  d_tx = schedules.adam(2e-4)
  return g, d, g_tx, d_tx, cfg


def init_state(g, d, g_tx, d_tx, cfg, batch=4):
  return create_state(g, d, g_tx, d_tx, KEY, batch_size=batch,
                      z_dim=ZDIM, image_shape=(RES, RES, 3),
                      num_classes=cfg.num_classes)


def fake_batch(cfg, batch=4):
  k1, k2 = jax.random.split(jax.random.PRNGKey(7))
  real = jax.random.uniform(k1, (cfg.training_ratio, batch, RES, RES, 3),
                            minval=-1, maxval=1)
  labels = (jax.random.randint(k2, (cfg.training_ratio, batch), 0,
                               max(cfg.num_classes, 1), jnp.int32))
  return real, labels


def _leaf_changed(a, b):
  return any(not np.allclose(np.asarray(x), np.asarray(y))
             for x, y in zip(jax.tree_util.tree_leaves(a),
                             jax.tree_util.tree_leaves(b)))


def test_outer_step_updates_everything():
  g, d, g_tx, d_tx, cfg = build()
  state = init_state(g, d, g_tx, d_tx, cfg)
  step_fn = make_jit_step(g, d, g_tx, d_tx, cfg, donate=False)
  real, labels = fake_batch(cfg)
  new_state, metrics = step_fn(state, real, labels)
  assert int(new_state.step) == 1
  for m in metrics.values():
    assert np.isfinite(float(m))
  assert _leaf_changed(state.g_params, new_state.g_params)
  assert _leaf_changed(state.d_params, new_state.d_params)
  assert _leaf_changed(state.d_state["spectral"], new_state.d_state["spectral"])
  assert _leaf_changed(state.g_state["wc_stats"], new_state.g_state["wc_stats"])
  # Two steps: rng advances, losses keep finite.
  s3, m2 = step_fn(new_state, real, labels)
  assert int(s3.step) == 2
  assert not np.array_equal(np.asarray(new_state.rng), np.asarray(s3.rng))


@pytest.mark.parametrize("kind", ["projection", "acgan", "wgan-gp",
                                  "d_norm"])
def test_outer_step_variants(kind):
  kwargs = dict(num_classes=4)
  loss = "hinge"
  gp = 0.0
  if kind == "projection":
    kwargs["projection"] = True
  elif kind == "acgan":
    kwargs["ac_gan"] = True
  elif kind == "wgan-gp":
    loss, gp = "wgan-gp", 10.0
    kwargs = {}
  elif kind == "d_norm":
    kwargs = dict(d_norm="d")
  g, d, g_tx, d_tx, cfg = build(loss=loss, gp=gp, **kwargs)
  state = init_state(g, d, g_tx, d_tx, cfg)
  step_fn = make_jit_step(g, d, g_tx, d_tx, cfg, donate=False)
  real, labels = fake_batch(cfg)
  new_state, metrics = step_fn(state, real, labels)
  assert all(np.isfinite(float(m)) for m in metrics.values())
  assert _leaf_changed(state.g_params, new_state.g_params)


def test_sn_update_on_g_step_advances_d_spectral():
  """--sn_update_on_g_step must actually advance D's SN u vectors on the
  G update (ADVICE r1: the mutation used to be silently discarded)."""
  import dataclasses as dc
  g, d, g_tx, d_tx, cfg = build()
  real, labels = fake_batch(cfg)

  def spectral_after(flag):
    c = dc.replace(cfg, training_ratio=0, sn_update_on_g_step=flag)
    # training_ratio=0: no D updates, so any spectral change comes from
    # the G step's D forward.
    state = init_state(g, d, g_tx, d_tx, c)
    step_fn = make_jit_step(g, d, g_tx, d_tx, c, donate=False)
    new_state, _ = step_fn(state, real[:0], labels[:0])
    return state.d_state["spectral"], new_state.d_state["spectral"]

  before, after = spectral_after(True)
  assert _leaf_changed(before, after)
  before, after = spectral_after(False)
  assert not _leaf_changed(before, after)


def test_sharded_step_runs_and_stays_replicated():
  mesh = make_mesh()
  assert mesh.devices.size == 8, "conftest should give 8 CPU devices"
  g, d, g_tx, d_tx, cfg = build(axis_name=DATA_AXIS)
  state = init_state(g, d, g_tx, d_tx, cfg, batch=16)
  step_fn = make_sharded_step(mesh, g, d, g_tx, d_tx, cfg, donate=False)
  real, labels = fake_batch(cfg, batch=16)
  new_state, metrics = step_fn(state, real, labels)
  assert all(np.isfinite(float(m)) for m in metrics.values())
  assert _leaf_changed(state.g_params, new_state.g_params)
  # Replication contract: every state leaf must be fully replicated.
  for leaf in jax.tree_util.tree_leaves(new_state):
    assert leaf.sharding.is_fully_replicated


def test_global_batch_whitening_invariant():
  """Cross-replica moments == single-device moments of the global batch —
  the north star's global-batch-semantics invariant (SURVEY.md §4)."""
  mesh = make_mesh()
  rng = np.random.default_rng(3)
  x = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32) * 2 + 1)

  local = functools.partial(whiten.batch_moments, axis_name=DATA_AXIS)
  sharded = jax.jit(jax.shard_map(
      local, mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P()))
  mean_s, cov_s = sharded(x)
  mean_g, cov_g = whiten.batch_moments(x)
  np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean_g),
                             atol=1e-5)
  np.testing.assert_allclose(np.asarray(cov_s), np.asarray(cov_g),
                             atol=1e-5)


def test_generator_ema_tracks_params():
  import dataclasses as dc
  from wcgan_tpu.train.state import create_state as cs
  g, d, g_tx, d_tx, cfg = build()
  cfg = dc.replace(cfg, g_ema_decay=0.9)
  state = cs(g, d, g_tx, d_tx, KEY, batch_size=4, z_dim=ZDIM,
             image_shape=(RES, RES, 3), g_ema=True)
  step_fn = make_jit_step(g, d, g_tx, d_tx, cfg, donate=False)
  real, labels = fake_batch(cfg)
  new_state, _ = step_fn(state, real, labels)
  # EMA moved toward the updated params but is not equal to them.
  assert _leaf_changed(state.g_ema, new_state.g_ema)
  assert _leaf_changed(new_state.g_ema, new_state.g_params)


def test_batched_fake_gen_exact_for_stat_free_g():
  """--batched_fake_gen reuses the per-k rng streams, so with a stat-free
  G (no batch-whitening: per-sample math only) the outer step must
  produce the SAME updates as the per-D-step fake generation path."""
  import dataclasses as dc
  g, d, g_tx, d_tx, cfg = build(g_norm="n")
  real, labels = fake_batch(cfg)

  def run(flag):
    c = dc.replace(cfg, batched_fake_gen=flag)
    state = init_state(g, d, g_tx, d_tx, c)
    step_fn = make_jit_step(g, d, g_tx, d_tx, c, donate=False)
    new_state, metrics = step_fn(state, real, labels)
    return new_state, metrics

  s_a, m_a = run(False)
  s_b, m_b = run(True)
  for k in m_a:
    np.testing.assert_allclose(float(m_a[k]), float(m_b[k]), atol=1e-5,
                               err_msg=k)
  for la, lb in zip(jax.tree_util.tree_leaves(s_a.d_params),
                    jax.tree_util.tree_leaves(s_b.d_params)):
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-5)


def test_d_fake_stats_running_exact_for_stat_free_g():
  """--d_fake_stats running only changes the WHITENING stats source of
  the D-phase fake forwards; a stat-free G (norm 'n') has no stats, so
  train- and eval-mode forwards are the same function and the outer
  step must produce identical updates."""
  import dataclasses as dc
  g, d, g_tx, d_tx, cfg = build(g_norm="n")
  real, labels = fake_batch(cfg)

  def run(mode):
    c = dc.replace(cfg, d_fake_stats=mode)
    state = init_state(g, d, g_tx, d_tx, c)
    step_fn = make_jit_step(g, d, g_tx, d_tx, c, donate=False)
    return step_fn(state, real, labels)

  s_a, m_a = run("batch")
  s_b, m_b = run("running")
  for k in m_a:
    np.testing.assert_allclose(float(m_a[k]), float(m_b[k]), atol=1e-5,
                               err_msg=k)
  for la, lb in zip(jax.tree_util.tree_leaves(s_a.d_params),
                    jax.tree_util.tree_leaves(s_b.d_params)):
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-5)


@pytest.mark.parametrize("kind", ["wc", "cond", "batched"])
def test_d_fake_stats_running_variants_train(kind):
  """Running-stats D-phase fakes with a WC G: finite metrics, both
  models update, and — the semantic contract — G's wc_stats advance
  EXACTLY as in batch mode (stats move only on the G update, whose
  batch-stat semantics the mode does not touch)."""
  import dataclasses as dc
  kwargs = {}
  if kind == "cond":
    kwargs = dict(num_classes=4, projection=True)
  g, d, g_tx, d_tx, cfg = build(**kwargs)
  cfg = dc.replace(cfg, d_fake_stats="running",
                   batched_fake_gen=(kind == "batched"))
  state = init_state(g, d, g_tx, d_tx, cfg)
  step_fn = make_jit_step(g, d, g_tx, d_tx, cfg, donate=False)
  real, labels = fake_batch(cfg)
  new_state, metrics = step_fn(state, real, labels)
  assert all(np.isfinite(float(m)) for m in metrics.values())
  assert _leaf_changed(state.g_params, new_state.g_params)
  assert _leaf_changed(state.d_params, new_state.d_params)
  assert _leaf_changed(state.g_state["wc_stats"],
                       new_state.g_state["wc_stats"])


def test_sharded_step_d_fake_stats_running_contract():
  """d_fake_stats=running under the 8-device mesh: the eval-mode D-phase
  G forwards read replicated running stats (per-sample math, no batch
  axis), so the sharded step must run, keep every state leaf fully
  replicated, and advance G's wc_stats EXACTLY as batch mode does with
  the same seed — the EMA trajectory stays mode-invariant cross-replica
  (stats move only on the G update, whose batch-stat semantics and rng
  stream the mode does not touch)."""
  import dataclasses as dc
  mesh = make_mesh()
  g, d, g_tx, d_tx, base = build(axis_name=DATA_AXIS)
  real, labels = fake_batch(base, batch=16)

  stats_by_mode = {}
  for mode in ("batch", "running"):
    cfg = dc.replace(base, d_fake_stats=mode)
    state = init_state(g, d, g_tx, d_tx, cfg, batch=16)
    step_fn = make_sharded_step(mesh, g, d, g_tx, d_tx, cfg,
                                donate=False)
    new_state, metrics = step_fn(state, real, labels)
    assert all(np.isfinite(float(m)) for m in metrics.values()), mode
    for leaf in jax.tree_util.tree_leaves(new_state):
      assert leaf.sharding.is_fully_replicated, mode
    assert _leaf_changed(state.g_state["wc_stats"],
                         new_state.g_state["wc_stats"]), mode
    stats_by_mode[mode] = new_state.g_state["wc_stats"]

  for la, lb in zip(jax.tree_util.tree_leaves(stats_by_mode["batch"]),
                    jax.tree_util.tree_leaves(stats_by_mode["running"])):
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-5)


def test_d_fake_stats_rejects_unknown_mode():
  import dataclasses as dc
  g, d, g_tx, d_tx, cfg = build()
  cfg = dc.replace(cfg, d_fake_stats="frozen")
  with pytest.raises(ValueError, match="d_fake_stats"):
    make_outer_step(g, d, g_tx, d_tx, cfg)


@pytest.mark.parametrize("kind", ["wc", "projection"])
def test_batched_fake_gen_variants_run(kind):
  """The WC (batch-stat) and conditional projection paths under
  --batched_fake_gen: moments over ratio*B rows, labels threaded through
  the scan — must train with finite metrics."""
  import dataclasses as dc
  kwargs = dict(num_classes=4, projection=True) if kind == "projection" \
      else {}
  g, d, g_tx, d_tx, cfg = build(**kwargs)
  cfg = dc.replace(cfg, batched_fake_gen=True)
  state = init_state(g, d, g_tx, d_tx, cfg)
  step_fn = make_jit_step(g, d, g_tx, d_tx, cfg, donate=False)
  real, labels = fake_batch(cfg)
  new_state, metrics = step_fn(state, real, labels)
  assert all(np.isfinite(float(m)) for m in metrics.values())
  assert _leaf_changed(state.g_params, new_state.g_params)
  assert _leaf_changed(state.d_params, new_state.d_params)


def test_sharded_generator_forward_matches_single_device():
  """Model-level global-batch whitening semantics: a data-sharded G
  forward (train mode, cross-replica moments) must produce the same
  images as the unsharded forward on the full batch."""
  mesh = make_mesh()
  gcfg = GeneratorConfig(z_dim=ZDIM, resolution=RES, base_resolution=4,
                         filters=(8,), ns_iters=10, axis_name=DATA_AXIS)
  g = Generator(cfg=gcfg)
  z = jax.random.normal(KEY, (16, ZDIM))
  variables = g.init(KEY, z, train=True)

  def fwd(z):
    out, _ = g.apply(variables, z, train=True, mutable=["wc_stats"])
    return out

  sharded = jax.jit(jax.shard_map(
      fwd, mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P(DATA_AXIS)))

  # Unsharded reference: same model with axis_name=None sees the full
  # batch, so its batch moments equal the sharded global moments.
  g0 = Generator(cfg=GeneratorConfig(
      z_dim=ZDIM, resolution=RES, base_resolution=4, filters=(8,),
      ns_iters=10, axis_name=None))
  out_ref, _ = g0.apply(variables, z, train=True, mutable=["wc_stats"])
  out_sh = sharded(z)
  np.testing.assert_allclose(np.asarray(out_sh), np.asarray(out_ref),
                             atol=2e-5)
