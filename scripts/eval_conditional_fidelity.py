#!/usr/bin/env python
"""Conditional-generation fidelity: classify generated samples with an
independent judge trained on the real data; report accuracy vs the
requested labels (chance = 1/num_classes).

Currently wired for the bundled `digits` dataset (the only real image
data on a zero-egress box). Round-1 result: 98.6% after 300 epochs of
cWC + projection-D (docs/ROADMAP.md).

Usage:
  python scripts/eval_conditional_fidelity.py \
      --checkpoints_dir /path/ck --name digits [--samples 640]
"""

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
  sys.path.insert(0, ".")
  ap = argparse.ArgumentParser()
  ap.add_argument("--checkpoints_dir", required=True)
  ap.add_argument("--output_dir", default="/tmp/fidelity_out")
  ap.add_argument("--name", required=True)
  ap.add_argument("--samples", type=int, default=640)
  ap.add_argument("--block_coloring", default="ucconv")
  ap.add_argument("--gan_type", default="PROJECTIVE",
                  choices=["PROJECTIVE", "AC_GAN"],
                  help="must match the training run (the D head differs "
                       "— projection embedding vs fc_cls aux classifier "
                       "— so the restore template must too)")
  ap.add_argument("--generator_ema", type=float, default=0.0,
                  help="must match the training run (restore template "
                       "shape)")
  ap.add_argument("--sample_from", choices=("auto", "raw", "running"),
                  default="auto",
                  help="auto = the sampler's own rule (EMA params + "
                       "standing stats when the run trained with "
                       "--generator_ema); raw = drop the restored EMA "
                       "shadow and sample from the raw parameters; "
                       "running = EMA params against the raw "
                       "trajectory's running stats (the pre-r5 "
                       "behavior, kept measurable) — the three arms of "
                       "the EMA A/B on the same checkpoint")
  args = ap.parse_args(argv)

  import jax.numpy as jnp
  from sklearn.datasets import load_digits
  from sklearn.linear_model import LogisticRegression

  from wcgan_tpu.cli.run import build_experiment, build_parser

  d = load_digits()
  judge = LogisticRegression(max_iter=2000).fit(
      d.images.reshape(len(d.images), -1), d.target)

  run_argv = ["--dataset", "digits", "--gan_type", args.gan_type,
              "--arch", "res", "--batch_size", "64", "--bf16",
              "--generator_block_coloring", args.block_coloring,
              "--generator_last_coloring", args.block_coloring,
              "--output_dir", args.output_dir,
              "--checkpoints_dir", args.checkpoints_dir,
              "--name", args.name,
              "--generator_ema", str(args.generator_ema)]
  trainer = build_experiment(build_parser().parse_args(run_argv))
  latest = trainer.latest_checkpoint()
  if latest is None:
    print(f"no checkpoint under {args.checkpoints_dir}/{args.name}")
    return 1
  trainer.restore_checkpoint(latest)
  if args.sample_from == "raw" and trainer.state.g_ema:
    # Same mechanism as eval_digits_fid: drop the restored EMA shadow
    # so the sampling rule (EMA-if-present) falls through to raw params.
    trainer.state = trainer.state.replace(g_ema={})
  if args.sample_from == "running":
    trainer.cfg.ema_standing_batches = 0

  n = args.samples - args.samples % 10
  rng = np.random.default_rng(0)
  req = np.tile(np.arange(10, dtype=np.int32), n // 10)
  z = rng.standard_normal((n, trainer.gan_cfg.z_dim)).astype(np.float32)
  imgs = np.asarray(trainer._sample(trainer.sampling_state(),
                                    jnp.asarray(z), jnp.asarray(req)))
  u8 = (np.clip(imgs, -1, 1) * 127.5 + 127.5)[..., 0]
  small = u8.reshape(n, 8, 2, 8, 2).mean((2, 4)) / 255.0 * 16.0
  pred = judge.predict(small.reshape(n, -1))
  acc = float((pred == req).mean())
  print(f"checkpoint: {latest}")
  print(f"conditional fidelity: {acc:.3f} over {n} samples "
        f"(chance = 0.100)")
  return 0


if __name__ == "__main__":
  raise SystemExit(main())
