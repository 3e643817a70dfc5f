#!/usr/bin/env python
"""Real-feature-space FID + IS trajectories on real images (VERDICT r2 #2).

The IS/FID evaluator math is unit-tested against scipy, but with no
Inception weights on this box no *distributional* quality metric had
ever been produced from real images through the whole
G -> feature-net -> frechet_distance loop. This script closes that:

1. Trains a small, independent convolutional feature network to
   classify the bundled sklearn digits (the only real image data on a
   zero-egress box) — the Inception-analog. Features = its 64-d
   penultimate layer; class probabilities = its softmax head.
2. Walks every full-state checkpoint of a digits GAN run
   (``checkpoints_dir/<name>/epoch_*``), generates samples from each,
   and computes (a) the Fréchet distance between generated and real
   feature moments with the SAME ``frechet_distance`` the production
   FID path uses, and (b) the Inception-Score analog
   exp(E KL(p(y|x) || p(y))) on the judge's softmax with the SAME
   ``inception_score`` split math (``wcgan_tpu/evaluation/metrics.py``;
   rebuilds ``gan/fid.py`` + ``gan/inception_score.py``'s roles [U],
   SURVEY.md §2a).
3. Prints both trajectories plus calibration rows: real-vs-real split
   FID / real-digits IS (the targets) and uniform-noise FID / IS (the
   degenerate ends).

Usage — first train the digits run (README r3 table used exactly this,
~6 min on one v5e chip):
  python run.py --dataset digits --gan_type PROJECTIVE --arch res \
      --batch_size 64 --generator_block_coloring ucconv \
      --generator_last_coloring ucconv --bf16 --number_of_epochs 300 \
      --checkpoint_ratio 25 --display_ratio 50 \
      --output_dir /tmp/digits_out --checkpoints_dir /tmp/digits_ckpt \
      --name digits_r3
then:
  python scripts/eval_digits_fid.py --checkpoints_dir /tmp/digits_ckpt \
      --output_dir /tmp/digits_out --name digits_r3 \
      [--samples 1797] [--platform cpu]
"""

import argparse
import os
import sys

import numpy as np


def build_feature_net(images_u8, labels, rng_seed=0, steps=600,
                      batch=256, lr=1e-3):
  """Train the judge CNN; returns (judge_fn, train_accuracy).

  judge_fn: uint8 NHWC -> (features, probs) — (N, 64) float32
  penultimate features and (N, 10) float32 softmax class
  probabilities, in one batched forward (advisor r3: docstring said
  3-tuple of separate fns; the actual contract is this 2-tuple).
  """
  import jax
  import jax.numpy as jnp
  import optax
  from flax import linen as nn

  class Judge(nn.Module):
    @nn.compact
    def __call__(self, x):
      x = nn.relu(nn.Conv(32, (3, 3))(x))
      x = nn.avg_pool(x, (2, 2), (2, 2))
      x = nn.relu(nn.Conv(64, (3, 3))(x))
      x = jnp.mean(x, axis=(1, 2))
      feats = nn.relu(nn.Dense(64)(x))
      logits = nn.Dense(10)(feats)
      return feats, logits

  model = Judge()
  x_all = jnp.asarray(images_u8, jnp.float32) / 127.5 - 1.0
  y_all = jnp.asarray(labels, jnp.int32)
  params = model.init(jax.random.PRNGKey(rng_seed), x_all[:2])
  tx = optax.adam(lr)
  opt = tx.init(params)

  @jax.jit
  def train_step(params, opt, x, y):
    def loss_fn(p):
      _, logits = model.apply(p, x)
      return optax.softmax_cross_entropy_with_integer_labels(
          logits, y).mean()
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt = tx.update(grads, opt)
    return optax.apply_updates(params, updates), opt, loss

  rng = np.random.default_rng(rng_seed)
  n = len(images_u8)
  for _ in range(steps):
    idx = rng.integers(0, n, size=min(batch, n))
    params, opt, _ = train_step(params, opt, x_all[idx], y_all[idx])

  @jax.jit
  def feats_fn(x_u8):
    x = jnp.asarray(x_u8, jnp.float32) / 127.5 - 1.0
    feats, logits = model.apply(params, x)
    return feats, jax.nn.softmax(logits, axis=-1)

  _, logits = model.apply(params, x_all)
  acc = float((jnp.argmax(logits, -1) == y_all).mean())

  def judge_fn(u8):
    """One jitted forward -> (features, probs); callers needing both
    must not pay two passes + two fetches per batch."""
    feats, probs = feats_fn(u8)
    return np.asarray(feats, np.float32), np.asarray(probs, np.float32)

  return judge_fn, acc


def fid_between(feats_a, feats_b):
  import jax.numpy as jnp
  from wcgan_tpu.evaluation import metrics
  mu_a, sig_a = metrics.moments_from_activations(jnp.asarray(feats_a))
  mu_b, sig_b = metrics.moments_from_activations(jnp.asarray(feats_b))
  return metrics.fid_from_moments(mu_a, sig_a, mu_b, sig_b)


def main(argv=None) -> int:
  sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
  ap = argparse.ArgumentParser()
  ap.add_argument("--checkpoints_dir", required=True)
  ap.add_argument("--output_dir", default="/tmp/digits_fid_out")
  ap.add_argument("--name", required=True)
  ap.add_argument("--samples", type=int, default=1797,
                  help="generated samples per checkpoint (default = the "
                       "size of the real digits set, for a balanced FID)")
  ap.add_argument("--block_coloring", default="ucconv")
  ap.add_argument("--generator_ema", type=float, default=0.0)
  ap.add_argument("--sample_from", choices=("auto", "raw", "running"),
                  default="auto",
                  help="'auto' = the trainer's sampling rule (EMA weights "
                       "+ standing stats when the run trained with "
                       "--generator_ema, raw otherwise); 'raw' = force "
                       "raw g_params even on an EMA checkpoint; "
                       "'running' = EMA weights against the raw "
                       "trajectory's running stats (pre-r5 behavior, "
                       "kept measurable) — three arms of the EMA A/B "
                       "from ONE training run (the EMA is a passive "
                       "shadow, so one run carries every weight set)")
  ap.add_argument("--bf16", type=int, default=1,
                  help="must match the training run")
  ap.add_argument("--platform", default="auto")
  args = ap.parse_args(argv)

  if args.platform != "auto":
    import jax
    jax.config.update("jax_platforms",
                      {"tpu": "axon"}.get(args.platform, args.platform))

  import jax.numpy as jnp
  from wcgan_tpu.cli.run import build_experiment, build_parser

  run_argv = ["--dataset", "digits", "--gan_type", "PROJECTIVE",
              "--arch", "res", "--batch_size", "64",
              "--generator_block_coloring", args.block_coloring,
              "--generator_last_coloring", args.block_coloring,
              "--output_dir", args.output_dir,
              "--checkpoints_dir", args.checkpoints_dir,
              "--name", args.name,
              "--generator_ema", str(args.generator_ema)]
  if args.bf16:
    run_argv.append("--bf16")
  trainer = build_experiment(build_parser().parse_args(run_argv))
  if args.sample_from == "running":
    trainer.cfg.ema_standing_batches = 0

  ckpt_root = trainer.ckpt_dir
  epochs = []
  for d in os.listdir(ckpt_root):
    if not d.startswith("epoch_") or d.endswith(".npz"):
      continue
    # Interrupted orbax saves leave epoch_<n>.orbax-checkpoint-tmp-*
    # dirs; skip anything whose suffix is not a clean integer (the same
    # guard Trainer.latest_checkpoint uses).
    try:
      epochs.append(int(d.split("_")[1]))
    except ValueError:
      continue
  epochs.sort()
  if not epochs:
    print(f"no full-state checkpoints under {ckpt_root}")
    return 1

  real_u8 = trainer.ds.images  # (1797, 16, 16, 1) uint8
  real_y = trainer.ds.labels
  judge_fn, judge_acc = build_feature_net(real_u8, real_y)
  print(f"judge feature net trained: accuracy {judge_acc:.3f} on "
        f"{len(real_u8)} real digits (features = 64-d penultimate)")

  import jax.numpy as _jnp
  from wcgan_tpu.evaluation import metrics as _metrics

  def is_of(probs):
    mean, std = _metrics.inception_score(_jnp.asarray(probs))
    return float(mean), float(std)

  feats_real, probs_real = judge_fn(real_u8)
  # Calibration: the floor (real vs real split) and a ceiling (noise)
  # for FID; the real-digits and uniform-noise IS-analogs bracket the
  # meaningful IS range the same way (10 balanced classes => max 10).
  half = len(real_u8) // 2
  floor = fid_between(feats_real[:half], feats_real[half:2 * half])
  rng = np.random.default_rng(0)
  noise_u8 = rng.integers(0, 256, real_u8.shape, dtype=np.uint8)
  feats_noise, probs_noise = judge_fn(noise_u8)
  ceil = fid_between(feats_real, feats_noise)
  is_real, is_real_std = is_of(probs_real)
  is_noise, _ = is_of(probs_noise)
  print(f"calibration: FID real-split floor {floor:.3f} | "
        f"FID uniform-noise ceiling {ceil:.3f} | "
        f"IS real digits {is_real:.3f}±{is_real_std:.3f} | "
        f"IS uniform noise {is_noise:.3f}")

  print("| epoch | feature-FID (fake vs real) | IS-analog |")
  print("|---|---|---|")
  traj = []
  for ep in epochs:
    trainer.restore_checkpoint(trainer.checkpoint_path(ep))
    # Full restored state — the orbax restore template for the NEXT
    # epoch (restore_checkpoint passes trainer.state as the template, so
    # sampling-time mutations must not leak into it; dropping g_ema here
    # made every restore after the first fail with a structure mismatch
    # — r5 sweep abort, 2026-08-20).
    restored = trainer.state
    if args.sample_from == "raw" and trainer.state.g_ema:
      # Drop the restored EMA shadow so Trainer.generate's sampling rule
      # (EMA-if-present) falls through to the raw parameters.
      trainer.state = trainer.state.replace(g_ema={})
    fake_u8 = trainer.generate(args.samples)
    trainer.state = restored
    feats_fake, probs_fake = judge_fn(fake_u8)
    fid = fid_between(feats_fake, feats_real)
    is_m, is_s = is_of(probs_fake)
    traj.append((ep, fid, is_m))
    print(f"| {ep} | {fid:.3f} | {is_m:.3f}±{is_s:.3f} |", flush=True)

  first, last = traj[0][1], traj[-1][1]
  print(f"FID trajectory: {first:.3f} (epoch {traj[0][0]}) -> {last:.3f} "
        f"(epoch {traj[-1][0]}); decreasing={last < first}")
  print(f"IS trajectory: {traj[0][2]:.3f} -> {traj[-1][2]:.3f} "
        f"(real-digits target {is_real:.3f}); "
        f"increasing={traj[-1][2] > traj[0][2]}")
  return 0


if __name__ == "__main__":
  raise SystemExit(main())
