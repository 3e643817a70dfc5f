"""End-to-end CLI test — SURVEY.md §4 integration tier: short synthetic
run through the real entry point, artifacts produced, resume works."""

import json
import os

import numpy as np
import pytest

from wcgan_tpu.cli.run import main

TINY = [
    "--platform", "auto",  # conftest already pinned cpu in-process
    "--dataset", "synthetic", "--arch", "dcgan",
    "--batch_size", "8", "--training_ratio", "2",
    "--generator_filters", "16,16,16", "--discriminator_filters", "16,16",
    "--synthetic_size", "128", "--ns_iters", "6",
    "--batches_per_epoch", "3", "--checkpoint_ratio", "1",
]


@pytest.fixture(scope="module")
def rundirs(tmp_path_factory):
  root = tmp_path_factory.mktemp("e2e")
  out, ckpt = str(root / "out"), str(root / "ckpt")
  argv = TINY + ["--output_dir", out, "--checkpoints_dir", ckpt,
                 "--number_of_epochs", "2", "--name", "smoke"]
  assert main(argv) == 0
  return out, ckpt, argv


def test_artifacts_produced(rundirs):
  out, ckpt, _ = rundirs
  run_out = os.path.join(out, "smoke")
  assert os.path.exists(os.path.join(run_out, "log.txt"))
  assert os.path.exists(os.path.join(run_out, "epoch_00000.png"))
  with open(os.path.join(run_out, "metrics.jsonl")) as f:
    records = [json.loads(line) for line in f]
  assert any("d_loss" in r for r in records)
  for r in records:
    for k in ("d_loss", "g_loss"):
      if k in r:
        assert np.isfinite(r[k])
  # Whitening-health observability: the NS residual probe must report a
  # converged inverse sqrt on these well-conditioned smoke covariances.
  resid = [r["wc_whiten_residual_max"] for r in records
           if "wc_whiten_residual_max" in r]
  assert resid and all(np.isfinite(v) for v in resid)
  ckpt_run = os.path.join(ckpt, "smoke")
  assert os.path.isdir(os.path.join(ckpt_run, "epoch_1"))
  assert os.path.exists(os.path.join(ckpt_run, "epoch_1_generator.npz"))
  assert os.path.exists(
      os.path.join(ckpt_run, "epoch_1_discriminator.npz"))


def test_resume_and_test_phase(rundirs):
  out, ckpt, argv = rundirs
  resumed = argv + ["--number_of_epochs", "3", "--start_epoch", "2",
                    "--resume", "auto"]  # later flags win in argparse
  assert main(resumed) == 0
  with open(os.path.join(out, "smoke", "log.txt")) as f:
    text = f.read()
  assert "resumed from" in text
  assert "Epoch 2:" in text

  gweights = os.path.join(ckpt, "smoke", "epoch_1_generator.npz")
  testargs = argv + ["--phase", "test",
                     "--generator_checkpoint", gweights]
  assert main(testargs) == 0


def test_h5_checkpoint_loads_directly(rundirs, tmp_path):
  """Reference-parity load path: a Keras-style .h5 passed straight to
  --generator_checkpoint (reference checkpoints are .h5 [U]; converted
  users should not need a manual to_npz step)."""
  pytest.importorskip("h5py")
  from wcgan_tpu.tools.h5_convert import npz_to_h5
  out, ckpt, argv = rundirs
  gnpz = os.path.join(ckpt, "smoke", "epoch_1_generator.npz")
  gh5 = str(tmp_path / "epoch_1_generator.h5")
  npz_to_h5(gnpz, gh5)
  assert main(argv + ["--phase", "test",
                      "--generator_checkpoint", gh5]) == 0


def test_checkpoint_missing_init_cli(rundirs, tmp_path):
  """--checkpoint_missing init end-to-end: a weights file with one param
  deleted (the ROADMAP #9 pre-conv_sc migration shape) loads through the
  CLI, logging the kept-at-init key; the strict default still refuses."""
  out, ckpt, argv = rundirs
  gnpz = os.path.join(ckpt, "smoke", "epoch_1_generator.npz")
  data = dict(np.load(gnpz))
  removed = sorted(data)[0]
  del data[removed]
  broken = str(tmp_path / "missing_one.npz")
  np.savez(broken, **data)
  assert main(argv + ["--phase", "test",
                      "--generator_checkpoint", broken,
                      "--checkpoint_missing", "init"]) == 0
  log = open(os.path.join(out, "smoke", "log.txt")).read()
  assert "kept at init" in log and removed in log
  with pytest.raises(KeyError, match="checkpoint_missing"):
    main(argv + ["--phase", "test", "--generator_checkpoint", broken])


def test_resume_auto_infers_start_epoch(tmp_path):
  """--resume auto without an explicit --start_epoch must continue the
  epoch schedule from the checkpoint, not relabel from 0 (and not train
  number_of_epochs extra epochs)."""
  out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
  base = TINY + ["--output_dir", out, "--checkpoints_dir", ckpt,
                 "--name", "ar"]
  assert main(base + ["--number_of_epochs", "2"]) == 0
  assert main(base + ["--number_of_epochs", "4", "--resume", "auto"]) == 0
  log = open(os.path.join(out, "ar", "log.txt")).read()
  assert "(start_epoch 2)" in log
  assert "Epoch 2:" in log and "Epoch 3:" in log
  # epochs 0/1 ran once (before resume), not again after it:
  assert log.count("Epoch 0:") == 1 and log.count("Epoch 1:") == 1


def test_mesh_training_via_cli(tmp_path):
  """Data-parallel path through the real CLI on the 8-device CPU mesh:
  sharded device-resident dataset, cross-replica whitening, checkpoints."""
  out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
  argv = [
      "--dataset", "synthetic", "--arch", "res", "--mesh", "8",
      "--batch_size", "16", "--training_ratio", "2",
      "--generator_filters", "16,16", "--discriminator_filters", "16,16",
      "--synthetic_size", "256", "--ns_iters", "6",
      "--batches_per_epoch", "4", "--steps_per_call", "2",
      "--number_of_epochs", "1", "--checkpoint_ratio", "1",
      "--output_dir", out, "--checkpoints_dir", ckpt, "--name", "mesh8",
  ]
  assert main(argv) == 0
  assert os.path.exists(os.path.join(out, "mesh8", "log.txt"))
  assert os.path.isdir(os.path.join(ckpt, "mesh8", "epoch_0"))


def test_window_rotation_for_large_datasets(tmp_path):
  """Datasets over the HBM budget train on a double-buffered rotating
  random window, driven purely through the CLI flag (--device_data_limit;
  VERDICT r1: no trainer privates)."""
  from wcgan_tpu.cli.run import build_parser, build_experiment
  out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
  bytes_per = 32 * 32 * 3  # synthetic RGB 32px
  argv = TINY + ["--output_dir", out, "--checkpoints_dir", ckpt,
                 "--number_of_epochs", "2", "--name", "win",
                 "--checkpoint_ratio", "0", "--display_ratio", "0",
                 "--device_data_limit", str(bytes_per * 40)]
  args = build_parser().parse_args(argv)
  trainer = build_experiment(args)
  # Two half-budget windows in flight: per-window size = (limit/2) /
  # bytes_per, so TOTAL window HBM stays within --device_data_limit
  # (full-package review r3; was limit/bytes_per => 2x the budget).
  assert trainer._window_elems == 20
  assert trainer._window_future is not None  # first window pre-staging
  trainer.train()
  assert trainer._device_data is not None
  assert trainer._device_data[0].shape[0] == 20
  # After train() the staging thread and the unconsumed prestaged window
  # are released (no dead HBM pinned during post-training eval/export).
  assert trainer._window_future is None
  assert trainer._window_exec is None
  with open(os.path.join(out, "win", "log.txt")) as f:
    assert "Epoch 1:" in f.read()


def test_window_rotation_via_main_cli(tmp_path):
  """The same path through the real entry point (argv only)."""
  out, ckpt = str(tmp_path / "o2"), str(tmp_path / "c2")
  argv = TINY + ["--output_dir", out, "--checkpoints_dir", ckpt,
                 "--number_of_epochs", "1", "--name", "wincli",
                 "--checkpoint_ratio", "0", "--display_ratio", "0",
                 "--device_data_limit", str(32 * 32 * 3 * 16)]
  assert main(argv) == 0
  with open(os.path.join(out, "wincli", "log.txt")) as f:
    assert "Epoch 0:" in f.read()


def test_epoch_honors_batches_per_epoch(tmp_path):
  """Regression (VERDICT r2 weak #6): with batches_per_epoch <
  steps_per_call, the chain must clamp to the epoch — previously a
  3-step epoch silently ran the full default chain of 8 outer steps."""
  from wcgan_tpu.cli.run import build_parser, build_experiment
  argv = TINY + ["--output_dir", str(tmp_path / "o"),
                 "--checkpoints_dir", str(tmp_path / "c"),
                 "--number_of_epochs", "1", "--name", "clamp",
                 "--checkpoint_ratio", "0", "--display_ratio", "0",
                 "--steps_per_call", "8"]  # > batches_per_epoch (3)
  trainer = build_experiment(build_parser().parse_args(argv))
  assert trainer._steps_per_call == 3
  trainer.train()
  assert int(trainer.state.step) == 3  # exactly the configured epoch


def test_whitening_residual_warning(tmp_path):
  """r3 soak finding: under-converged whitening (ns_iters too low for
  the covariance conditioning) must produce a loud log warning — losses
  alone look healthy while the conditioning explodes."""
  import jax
  import jax.numpy as jnp
  from wcgan_tpu.cli.run import build_parser, build_experiment
  argv = TINY + ["--output_dir", str(tmp_path / "o"),
                 "--checkpoints_dir", str(tmp_path / "c"),
                 "--number_of_epochs", "1", "--batches_per_epoch", "1",
                 "--name", "warn", "--checkpoint_ratio", "0",
                 "--display_ratio", "0", "--ns_iters", "4"]
  trainer = build_experiment(build_parser().parse_args(argv))
  # Plant an ill-conditioned running covariance: NS-4 cannot converge on
  # cond 1e6, so the live probe must fire the warning during train().
  stats = trainer.state.g_state["wc_stats"]
  path, leaf = next(
      (p, l) for p, l in
      jax.tree_util.tree_flatten_with_path(stats)[0]
      if "cov" in "/".join(str(x) for x in p))
  c = leaf.shape[0]
  bad = np.diag(np.logspace(0, -6, c)).astype(np.float32)

  def plant(keypath, l):
    same = keypath == path
    return jnp.asarray(bad) if same else l

  trainer.state = trainer.state.replace(
      g_state={**trainer.state.g_state,
               "wc_stats": jax.tree_util.tree_map_with_path(plant, stats)})
  resid = max(trainer._ns_residuals())
  assert resid > 1e-2  # the probe sees the under-convergence
  trainer.train()
  log = open(os.path.join(str(tmp_path / "o"), "warn",
                          "log.txt")).read()
  assert "whitening under-converged" in log


def _plant_ill_conditioned_cov(trainer):
  """Plant a cond-1e6 running covariance into the first WC layer (NS at
  the smoke ns_iters cannot converge on it, so the live probe trips)."""
  import jax
  import jax.numpy as jnp
  stats = trainer.state.g_state["wc_stats"]
  path, leaf = next(
      (p, l) for p, l in jax.tree_util.tree_flatten_with_path(stats)[0]
      if "cov" in "/".join(str(x) for x in p))
  bad = np.diag(np.logspace(0, -6, leaf.shape[0])).astype(np.float32)

  def plant(keypath, l):
    return jnp.asarray(bad) if keypath == path else l

  trainer.state = trainer.state.replace(
      g_state={**trainer.state.g_state,
               "wc_stats": jax.tree_util.tree_map_with_path(plant, stats)})


def test_wc_residual_action_abort(tmp_path):
  """VERDICT r4 weak #4: the guard must be able to STOP the run —
  checkpoint + loud abort like the NaN path — instead of scrolling
  warnings while the chip burns."""
  from wcgan_tpu.cli.run import build_parser, build_experiment
  argv = TINY + ["--output_dir", str(tmp_path / "o"),
                 "--checkpoints_dir", str(tmp_path / "c"),
                 "--number_of_epochs", "1", "--batches_per_epoch", "1",
                 "--name", "abort", "--checkpoint_ratio", "0",
                 "--display_ratio", "0", "--ns_iters", "4",
                 "--wc_residual_action", "abort"]
  trainer = build_experiment(build_parser().parse_args(argv))
  _plant_ill_conditioned_cov(trainer)
  with pytest.raises(FloatingPointError, match="whitening under-converged"):
    trainer.train()
  log = open(os.path.join(str(tmp_path / "o"), "abort", "log.txt")).read()
  assert "abort" in log and "whitening under-converged" in log
  # State preserved for post-mortem/resume (epoch-0 checkpoint).
  assert os.path.isdir(os.path.join(str(tmp_path / "c"), "abort",
                                    "epoch_0"))


def test_residual_probe_every_fires_intra_epoch(tmp_path):
  """--residual_probe_every: the probe must fire BETWEEN step chains —
  the measured feedback explosion can complete inside one long epoch,
  so epoch-cadence alone is too slow."""
  from wcgan_tpu.cli.run import build_parser, build_experiment
  argv = TINY + ["--output_dir", str(tmp_path / "o"),
                 "--checkpoints_dir", str(tmp_path / "c"),
                 "--number_of_epochs", "1", "--batches_per_epoch", "3",
                 "--steps_per_call", "1",
                 "--name", "intra", "--checkpoint_ratio", "0",
                 "--display_ratio", "0", "--ns_iters", "4",
                 "--wc_residual_action", "abort",
                 "--residual_probe_every", "1"]
  trainer = build_experiment(build_parser().parse_args(argv))
  _plant_ill_conditioned_cov(trainer)
  with pytest.raises(FloatingPointError):
    trainer.train()
  log = open(os.path.join(str(tmp_path / "o"), "intra", "log.txt")).read()
  # The abort came from the step-granular probe, before the epoch line.
  assert "step-1 probe" in log
  assert "imgs/sec" not in log  # no epoch completed


def test_wc_residual_action_fallback_running_demotes(tmp_path):
  """--wc_residual_action fallback, full ladder walk: a breach under
  d_fake_stats=running demotes to batch stats (rung 1, the measured
  EMA-lag drift source, docs/SOAK.md r4/r5), a second breach escalates
  ns_iters x2 (rung 3 — the planted cond-1e6 cov is past even the
  doubled envelope, so it stays breached), and the third exhausts the
  ladder and aborts like 'abort'. Each rung recompiles and the next
  epoch TRAINS through the rebuilt program."""
  from wcgan_tpu.cli.run import build_parser, build_experiment
  argv = TINY + ["--output_dir", str(tmp_path / "o"),
                 "--checkpoints_dir", str(tmp_path / "c"),
                 "--number_of_epochs", "3", "--batches_per_epoch", "1",
                 "--name", "fb_run", "--checkpoint_ratio", "0",
                 "--display_ratio", "0", "--ns_iters", "4",
                 "--wc_momentum", "0.999",  # keep the planted cov alive
                 "--d_fake_stats", "running",
                 "--wc_residual_action", "fallback",
                 "--fallback_cooldown", "0"]  # deterministic per-epoch
                                              # rung progression
  trainer = build_experiment(build_parser().parse_args(argv))
  _plant_ill_conditioned_cov(trainer)
  with pytest.raises(FloatingPointError, match="whitening under-converged"):
    trainer.train()
  assert trainer.gan_cfg.d_fake_stats == "batch"  # rung 1 applied
  assert trainer.g.cfg.ns_iters == 8              # rung 3 applied
  log = open(os.path.join(str(tmp_path / "o"), "fb_run", "log.txt")).read()
  assert "demoting d_fake_stats running -> batch" in log
  assert "escalating ns_iters 4 -> 8" in log
  assert "ladder exhausted" in log
  # Epochs 1-2 RAN on the rebuilt programs before exhausting: all three
  # epoch lines made it to the log.
  assert log.count("imgs/sec") == 3
  # All guard checkpoints landed (pre-rung x2 + pre-abort states).
  for e in ("epoch_0", "epoch_1", "epoch_2"):
    assert os.path.isdir(os.path.join(str(tmp_path / "c"), "fb_run", e))


def test_wc_residual_action_fallback_dr_demotes(tmp_path):
  """Rung 2: 'dr' norm codes demote to 'd' (the r5-measured feedback
  explosion), the G module is REBUILT, and the next epoch trains the
  existing state through the rebuilt programs — the param/stats tree
  must carry over unchanged. The epoch-1 breach then takes the ns rung
  and the run COMPLETES (no abort in a 2-epoch run)."""
  from wcgan_tpu.cli.run import build_parser, build_experiment
  argv = TINY + ["--output_dir", str(tmp_path / "o"),
                 "--checkpoints_dir", str(tmp_path / "c"),
                 "--number_of_epochs", "2", "--batches_per_epoch", "1",
                 "--name", "fb_dr", "--checkpoint_ratio", "0",
                 "--display_ratio", "0", "--ns_iters", "4",
                 "--wc_momentum", "0.999",
                 "--generator_block_norm", "dr",
                 "--generator_last_norm", "dr",
                 "--wc_residual_action", "fallback",
                 "--fallback_cooldown", "0"]
  trainer = build_experiment(build_parser().parse_args(argv))
  _plant_ill_conditioned_cov(trainer)
  trainer.train()  # rungs 2 then 3 rescue; must NOT raise
  assert trainer.g.cfg.block_norm == "d"
  assert trainer.g.cfg.last_norm == "d"
  log = open(os.path.join(str(tmp_path / "o"), "fb_dr", "log.txt")).read()
  assert "demoting generator 'dr' norm codes -> 'd'" in log
  assert log.count("imgs/sec") == 2  # epoch 1 trained the rebuilt module


def test_wc_residual_action_fallback_cooldown_suppresses(tmp_path):
  """Recovery window (default --fallback_cooldown -1 = auto): after a
  rung fires, later breaches inside ~5 EMA time constants must LOG but
  not escalate — the probe measures running covariances, which only
  re-converge at EMA speed, so without the window one transient would
  burn the whole ladder. With wc_momentum 0.999 the auto window is 5000
  outer steps >> this run, so epochs 1-2 re-breach (the planted cov is
  kept alive) yet the run completes without an abort."""
  from wcgan_tpu.cli.run import build_parser, build_experiment
  argv = TINY + ["--output_dir", str(tmp_path / "o"),
                 "--checkpoints_dir", str(tmp_path / "c"),
                 "--number_of_epochs", "3", "--batches_per_epoch", "1",
                 "--name", "fb_cool", "--checkpoint_ratio", "0",
                 "--display_ratio", "0", "--ns_iters", "4",
                 "--wc_momentum", "0.999",
                 "--d_fake_stats", "running",
                 "--whitening_precision", "highest",
                 "--wc_residual_action", "fallback"]
  trainer = build_experiment(build_parser().parse_args(argv))
  _plant_ill_conditioned_cov(trainer)
  trainer.train()  # must NOT raise: only rung 1 fires, then the window
  assert trainer.gan_cfg.d_fake_stats == "batch"
  log = open(os.path.join(str(tmp_path / "o"), "fb_cool", "log.txt")).read()
  assert "demoting d_fake_stats running -> batch" in log
  assert "fallback recovery window" in log
  assert "ladder exhausted" not in log
  assert log.count("imgs/sec") == 3  # all epochs trained


def test_wc_residual_action_fallback_ns_escalates(tmp_path):
  """Rung 3: at parity settings (batch stats, 'd' norms) the
  convergence-restoring rung doubles ns_iters — the measured envelope
  rung (trace/ns15 residual 2.0e-1 at cond 5e4 vs 6.6e-3 for ns30;
  docs/SOAK.md r5) — and the run CONTINUES (no abort). Whitening
  precision is deliberately NOT a rung: its lever is the residual
  FLOOR (6e-4 at high), and a breach is >1e-2 — floor-dominated
  breaches cannot exist above it (proven live in the on-chip demo)."""
  from wcgan_tpu.cli.run import build_parser, build_experiment
  argv = TINY + ["--output_dir", str(tmp_path / "o"),
                 "--checkpoints_dir", str(tmp_path / "c"),
                 "--number_of_epochs", "1", "--batches_per_epoch", "1",
                 "--name", "fb_ns", "--checkpoint_ratio", "0",
                 "--display_ratio", "0", "--ns_iters", "4",
                 "--wc_residual_action", "fallback"]
  trainer = build_experiment(build_parser().parse_args(argv))
  _plant_ill_conditioned_cov(trainer)
  trainer.train()  # must NOT raise: the rung fires and the epoch ends
  assert trainer.g.cfg.ns_iters == 8
  log = open(os.path.join(str(tmp_path / "o"), "fb_ns", "log.txt")).read()
  assert "escalating ns_iters 4 -> 8" in log
  assert "aborting" not in log


def test_residual_probe_finite_on_negative_rounded_diagonal(tmp_path):
  """Advisor r3: the live whitening probe must use ops/whiten.py's FULL
  _spd_jitter formula (incl. the 2*neg_diag term). A covariance whose
  diagonal rounds slightly negative — the exact input class _spd_jitter
  exists for (MXU-emulation junk at ~1e-9..1e-7 on near-constant
  features) — previously made the probe iterate a non-SPD matrix to
  NaN, and 'NaN > 1e-2' silently skipped the health warning for the
  worst inputs."""
  import jax
  import jax.numpy as jnp
  from wcgan_tpu.cli.run import build_parser, build_experiment
  argv = TINY + ["--output_dir", str(tmp_path / "o"),
                 "--checkpoints_dir", str(tmp_path / "c"),
                 "--number_of_epochs", "1", "--batches_per_epoch", "1",
                 "--name", "negdiag"]
  trainer = build_experiment(build_parser().parse_args(argv))
  stats = trainer.state.g_state["wc_stats"]
  path, leaf = next(
      (p, l) for p, l in jax.tree_util.tree_flatten_with_path(stats)[0]
      if "cov" in "/".join(str(x) for x in p))
  c = leaf.shape[0]
  # Near-constant features: ~zero covariance with one diagonal entry
  # rounded NEGATIVE, off-diagonal junk of the same magnitude.
  bad = (1e-8 * np.ones((c, c), np.float32)
         + np.diag(np.full(c, 1e-7, np.float32)))
  bad[0, 0] = -1e-7

  def plant(keypath, l):
    return jnp.asarray(bad) if keypath == path else l

  trainer.state = trainer.state.replace(
      g_state={**trainer.state.g_state,
               "wc_stats": jax.tree_util.tree_map_with_path(plant, stats)})
  residuals = trainer._ns_residuals()
  assert all(np.isfinite(r) for r in residuals), residuals


def test_generate_uses_one_static_shape(tmp_path):
  """VERDICT r1: generate() must not retrace for tail chunks — every
  _sample call gets a full static batch; the tail slices after."""
  from wcgan_tpu.cli.run import build_parser, build_experiment
  argv = TINY + ["--output_dir", str(tmp_path / "o"),
                 "--checkpoints_dir", str(tmp_path / "c"),
                 "--number_of_epochs", "1", "--name", "gen"]
  trainer = build_experiment(build_parser().parse_args(argv))
  shapes = []
  orig = trainer._sample_u8

  def spy(state, z, labels):
    shapes.append(tuple(z.shape))
    return orig(state, z, labels)

  trainer._sample_u8 = spy
  imgs = trainer.generate(10, batch=4)
  assert imgs.shape[0] == 10
  assert set(shapes) == {(4, trainer.gan_cfg.z_dim)}


def test_whitening_method_threads_into_both_models(tmp_path):
  """--whitening_method must reach BOTH model configs (the D-side
  threading was missing until late r3; the CLI silently ran D whitening
  with newton_schulz regardless of the flag)."""
  from wcgan_tpu.cli.run import build_parser, build_experiment
  argv = TINY + ["--output_dir", str(tmp_path / "o"),
                 "--checkpoints_dir", str(tmp_path / "c"),
                 "--number_of_epochs", "1", "--name", "wm",
                 "--whitening_method", "cholesky"]
  trainer = build_experiment(build_parser().parse_args(argv))
  assert trainer.g.cfg.ns_method == "cholesky"
  assert trainer.d.cfg.ns_method == "cholesky"


def test_same_args_same_seed_bitexact(tmp_path):
  """Two fresh runs with identical args must produce bit-identical
  generator params — guards CLI-level seeding (init, data shuffle,
  z draws, flips) against nondeterministic host RNG sneaking in.
  Complements the resume bit-exactness test (same step fn, different
  entry path)."""
  import jax
  import numpy as np
  from wcgan_tpu.cli.run import build_parser, build_experiment

  def run(tag):
    argv = TINY + ["--output_dir", str(tmp_path / tag / "o"),
                   "--checkpoints_dir", str(tmp_path / tag / "c"),
                   "--number_of_epochs", "1", "--name", tag,
                   "--checkpoint_ratio", "0", "--display_ratio", "0"]
    trainer = build_experiment(build_parser().parse_args(argv))
    trainer.train()
    return jax.tree_util.tree_map(np.asarray, trainer.state.g_params)

  a, b = run("deta"), run("detb")
  jax.tree_util.tree_map(
      lambda x, y: np.testing.assert_array_equal(x, y), a, b)


def test_cli_single_block_res_discriminator_builds(tmp_path):
  """Review r3: a len-1 --discriminator_filters on the res arch derived
  downsample=(False,) and tripped the optimized-block validation; the
  CLI must force downsample[0]=True (block 0 always downsamples)."""
  from wcgan_tpu.cli.run import build_parser, build_experiment
  argv = TINY + ["--arch", "res", "--discriminator_filters", "16",
                 "--generator_filters", "16,16",
                 "--output_dir", str(tmp_path / "o"),
                 "--checkpoints_dir", str(tmp_path / "c"),
                 "--number_of_epochs", "1", "--name", "d1"]
  trainer = build_experiment(build_parser().parse_args(argv))
  assert trainer.d.cfg.downsample == (True,)


def test_cli_dcgan_remat_builds(tmp_path):
  """Review r3: --arch dcgan --remat must keep working (remat applies to
  the generator; the dcgan D has nothing to rematerialize)."""
  from wcgan_tpu.cli.run import build_parser, build_experiment
  argv = TINY + ["--remat",
                 "--output_dir", str(tmp_path / "o"),
                 "--checkpoints_dir", str(tmp_path / "c"),
                 "--number_of_epochs", "1", "--name", "dr"]
  trainer = build_experiment(build_parser().parse_args(argv))
  assert trainer.g.cfg.remat


def test_generator_ema_sampling_and_raw_override(tmp_path):
  """--generator_ema end to end: after a short run the EMA shadow has
  diverged from the raw params, Trainer.generate samples from the EMA
  weights by default, and clearing state.g_ema (the eval scripts'
  --sample_from raw mechanics) falls back to raw-weight sampling —
  the two halves of an EMA A/B from ONE run's checkpoints."""
  from wcgan_tpu.cli.run import build_parser, build_experiment
  argv = TINY + ["--generator_ema", "0.5",
                 "--output_dir", str(tmp_path / "o"),
                 "--checkpoints_dir", str(tmp_path / "c"),
                 "--number_of_epochs", "2", "--name", "ema"]
  trainer = build_experiment(build_parser().parse_args(argv))
  trainer.train()

  import jax
  leaves_ema = jax.tree_util.tree_leaves(trainer.state.g_ema)
  leaves_raw = jax.tree_util.tree_leaves(trainer.state.g_params)
  assert leaves_ema and any(
      not np.allclose(np.asarray(e), np.asarray(p))
      for e, p in zip(leaves_ema, leaves_raw))

  ema_imgs = trainer.generate(8, batch=8)
  trainer.state = trainer.state.replace(g_ema={})
  raw_imgs = trainer.generate(8, batch=8)  # same rng_seed, raw weights
  assert not np.array_equal(ema_imgs, raw_imgs)

  # The full-state checkpoint round-trips the EMA shadow bit-exactly.
  trainer2 = build_experiment(build_parser().parse_args(argv))
  trainer2.restore_checkpoint(trainer2.latest_checkpoint())
  for a, b in zip(leaves_ema,
                  jax.tree_util.tree_leaves(trainer2.state.g_ema)):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_standing_stats_exact_swap_and_cache(tmp_path):
  """--ema_standing_stats (r5): EMA sampling must not reuse the raw
  trajectory's running stats (measured-broken through full-covariance
  whitening — digits fidelity 0.64 vs 0.87 standing, BASELINE.md r5).
  sampling_state() swaps in stats re-estimated under the EMA params:
  with n=1 the swap equals the un-EMA inversion of one direct
  train-mode apply; the training state stays untouched; the cache
  holds until the EMA shadow object changes; n=0 restores the old
  behavior."""
  import jax
  import jax.numpy as jnp
  from wcgan_tpu.cli.run import build_parser, build_experiment
  argv = TINY + ["--generator_ema", "0.5", "--ema_standing_stats", "1",
                 "--output_dir", str(tmp_path / "o"),
                 "--checkpoints_dir", str(tmp_path / "c"),
                 "--number_of_epochs", "1", "--name", "ema_ss"]
  trainer = build_experiment(build_parser().parse_args(argv))
  trainer.train()
  state = trainer.state

  ss = trainer.sampling_state()
  # Training state untouched; stats actually swapped.
  assert ss.g_state is not state.g_state
  assert trainer.state.g_state is state.g_state
  flat = lambda t: jax.tree_util.tree_leaves(t)
  assert any(not np.allclose(np.asarray(a), np.asarray(b))
             for a, b in zip(flat(ss.g_state["wc_stats"]),
                             flat(state.g_state["wc_stats"])))

  # Exactness at n=1: the swapped stats equal the un-EMA inversion of
  # one direct train-mode apply under the EMA params with the method's
  # own z/label stream (rng_seed=4321, one batch).
  m = trainer.g.cfg.wc_momentum
  rng = np.random.default_rng(4321)
  b = trainer.ds.batch_size
  z = jnp.asarray(rng.standard_normal((b, trainer.gan_cfg.z_dim))
                  .astype(np.float32))
  _, mut = trainer.g.apply(
      {"params": state.g_ema, **state.g_state}, z, None, train=True,
      mutable=list(state.g_state.keys()))
  expected = jax.tree_util.tree_map(
      lambda new, old: (np.asarray(new, np.float32)
                        - m * np.asarray(old, np.float32)) / (1.0 - m),
      mut["wc_stats"], state.g_state["wc_stats"])
  for a, b_ in zip(flat(ss.g_state["wc_stats"]), flat(expected)):
    np.testing.assert_allclose(np.asarray(a, np.float32), b_,
                               rtol=1e-4, atol=1e-4)

  # Cache: same EMA shadow object -> same standing g_state object; a new
  # shadow (fresh pytree, e.g. after a step or restore) -> recompute.
  assert trainer.sampling_state().g_state is ss.g_state
  trainer.state = state.replace(
      g_ema=jax.tree_util.tree_map(lambda x: x, state.g_ema))
  assert trainer.sampling_state().g_state is not ss.g_state

  # n=0 disables the swap (pre-r5 behavior, kept measurable).
  trainer.cfg.ema_standing_batches = 0
  assert trainer.sampling_state() is trainer.state
