"""Experiment entry point — the reference's CLI contract, TPU-native.

Mirrors ``run.py::main`` + ``gan/cmd.py::parser_with_default_args`` [U]:
same flag names, defaults and norm/coloring code vocabulary wherever the
survey could reconstruct them (SURVEY.md §2a; spellings are the
highest-risk [U] items — re-verify against the reference if its mount
ever appears). TPU-specific additions are grouped under "TPU options".

Usage (reference-style):
  python run.py --dataset cifar10 --arch res --loss hinge \
      --generator_block_norm d --generator_block_coloring uconv \
      --number_of_epochs 50
  python run.py --phase test --generator_checkpoint <dir>
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import numpy as np

from wcgan_tpu.data import DATASETS, get_dataset
from wcgan_tpu.models.discriminator import (Discriminator,
                                            DiscriminatorConfig)
from wcgan_tpu.models.discriminator import preset_filters as d_presets
from wcgan_tpu.models.generator import Generator, GeneratorConfig
from wcgan_tpu.models.generator import preset_filters as g_presets
from wcgan_tpu.models.layers import COLORING_CODES, NORM_CODES
from wcgan_tpu.ops import whiten as whiten_ops
from wcgan_tpu.parallel import DATA_AXIS, make_mesh
from wcgan_tpu.train import schedules
from wcgan_tpu.train.step import GANConfig
from wcgan_tpu.train.trainer import Trainer, TrainerConfig


def build_parser() -> argparse.ArgumentParser:
  p = argparse.ArgumentParser(
      description="wcgan_tpu — TPU-native WC-GAN training")

  # --- gan/cmd.py::parser_with_default_args surface [U] ---
  p.add_argument("--name", default=None,
                 help="experiment name (default: derived from config)")
  p.add_argument("--output_dir", default="output")
  p.add_argument("--checkpoints_dir", default="checkpoints")
  p.add_argument("--batch_size", type=int, default=64)
  p.add_argument("--number_of_epochs", type=int, default=100)
  p.add_argument("--training_ratio", type=int, default=5)
  p.add_argument("--generator_batch_multiple", type=int, default=2)
  p.add_argument("--generator_lr", type=float, default=2e-4)
  p.add_argument("--discriminator_lr", type=float, default=2e-4)
  p.add_argument("--beta1", type=float, default=0.0)
  p.add_argument("--beta2", type=float, default=0.9)
  p.add_argument("--lr_decay_schedule", default="none",
                 choices=["none", "linear", "half-linear", "linear-end"])
  p.add_argument("--checkpoint_ratio", type=int, default=10)
  p.add_argument("--display_ratio", type=int, default=1)
  p.add_argument("--start_epoch", type=int, default=0)
  p.add_argument("--generator_checkpoint", default=None,
                 help="weights-only generator .npz (or Keras-style .h5) "
                      "to load")
  p.add_argument("--discriminator_checkpoint", default=None,
                 help="weights-only discriminator .npz (or Keras-style "
                      ".h5) to load")
  p.add_argument("--checkpoint_key_map", default=None,
                 help="JSON rename table applied when loading "
                      "--generator/--discriminator_checkpoint: either "
                      "one flat {src: dst} map for both, or "
                      "{'generator': {...}, 'discriminator': {...}} "
                      "sections (Keras default layer names collide "
                      "between G and D). The standing hook for the "
                      "reference's exact layer naming, SURVEY.md §8. "
                      "'re:<pattern>' sources are regex rename rules "
                      "(shipped migration maps: docs/keymaps/)")
  p.add_argument("--checkpoint_missing", default="error",
                 choices=["error", "init"],
                 help="params absent from a weights-only checkpoint: "
                      "'error' (default, strict) or 'init' — keep the "
                      "fresh initialization and list the kept keys. "
                      "Migration across documented checkpoint-tree "
                      "breaks (docs/ROADMAP.md #8/#9); the Keras "
                      "load_weights(by_name=True) analogue [U]")
  p.add_argument("--resume", default=None,
                 help="'auto' = latest full-state checkpoint, or a path")
  p.add_argument("--phase", default="train", choices=["train", "test"])
  p.add_argument("--seed", type=int, default=0)

  # --- run.py experiment flags [U] ---
  p.add_argument("--dataset", default="cifar10",
                 choices=sorted(DATASETS))
  p.add_argument("--data_dir", default="data")
  p.add_argument("--arch", default="res", choices=["res", "dcgan"])
  p.add_argument("--loss", default="hinge",
                 choices=["hinge", "ns", "wgan", "wgan-gp"])
  p.add_argument("--gan_type", default="GAN",
                 choices=["GAN", "PROJECTIVE", "AC_GAN"])
  p.add_argument("--gradient_penalty_weight", type=float, default=10.0)
  p.add_argument("--z_dim", type=int, default=128)
  p.add_argument("--conditional", action="store_true",
                 help="class-conditional training (labels flow to G/D)")
  p.add_argument("--generator_block_norm", default="d",
                 choices=list(NORM_CODES),
                 help="'d' = whiten with batch stats (default, reference "
                      "parity); 'dr' = whiten from running stats — "
                      "measured +14%% at shape but REJECTED by the r5 "
                      "10k conditional soak (whitening-residual feedback "
                      "explosion inside 2.5k outer steps, cond 2e3->3e5; "
                      "docs/SOAK.md) — pair with --wc_residual_action "
                      "abort if you must use it; 'b' = plain BN "
                      "(+16%% at shape, the paper's quality baseline)")
  p.add_argument("--generator_block_coloring", default="uconv",
                 choices=list(COLORING_CODES))
  p.add_argument("--generator_last_norm", default="d",
                 choices=list(NORM_CODES))
  p.add_argument("--generator_last_coloring", default="uconv",
                 choices=list(COLORING_CODES))
  p.add_argument("--generator_filters", default=None,
                 help="comma-separated per-block widths (default preset)")
  p.add_argument("--generator_concat_cls", action="store_true")
  p.add_argument("--discriminator_norm", default="n",
                 choices=list(NORM_CODES))
  p.add_argument("--discriminator_coloring", default="n",
                 choices=list(COLORING_CODES))
  p.add_argument("--discriminator_filters", default=None)
  p.add_argument("--discriminator_spectral", type=int, default=1,
                 help="1 = spectral-normalize D kernels (default)")
  p.add_argument("--spectral_iterations", type=int, default=1)
  p.add_argument("--fully_diff_spectral", action="store_true")
  p.add_argument("--conv_singular", action="store_true")
  p.add_argument("--filters_emb", type=int, default=10)
  p.add_argument("--sn_update_on_g_step", action="store_true")
  p.add_argument("--generator_ema", type=float, default=0.0,
                 help="EMA decay for generator weights used at sampling "
                      "(0 = off; e.g. 0.999)")
  p.add_argument("--ema_standing_stats", type=int, default=16,
                 help="train-mode batches used to re-estimate G's "
                      "normalization statistics under the EMA params "
                      "before EMA sampling (BigGAN standing stats; only "
                      "active with --generator_ema). 0 = sample EMA "
                      "params against the raw trajectory's running "
                      "stats — measured-broken through full-covariance "
                      "whitening (digits fidelity 0.64 vs 0.87 "
                      "standing; BASELINE.md r5)")
  p.add_argument("--random_flip", type=int, default=None,
                 help="1/0 on-device horizontal flip "
                      "(default: on for natural-image datasets)")
  p.add_argument("--batches_per_epoch", type=int, default=None)
  p.add_argument("--ns_iters", type=int, default=15,
                 help="Newton-Schulz iterations for whitening")
  p.add_argument("--whitening_method", default="newton_schulz",
                 choices=["newton_schulz", "cholesky"])
  p.add_argument("--ns_scaling", default="trace",
                 choices=["trace", "fro"],
                 help="convergence normalization of the Newton-Schulz "
                      "iterate: 'trace' (IterNorm parity, default) or "
                      "'fro' (Frobenius norm — for SPD matrices "
                      "lambda_max <= ||A||_F <= tr(A), so 'fro' shrinks "
                      "the spectrum less and converges faster; measured "
                      "r4 at ns_iters 15: never worse, 3-31x lower "
                      "residual at covariance conditioning >= 1e3, "
                      "identical cost — docs/SOAK.md)")
  p.add_argument("--wc_momentum", type=float, default=0.99,
                 help="EMA momentum of the WC/BN running statistics "
                      "(Keras BN default 0.99). Lower values make the "
                      "running stats fresher — measured (docs/SOAK.md "
                      "r4, 50k A/B): 0.9 cuts --d_fake_stats running's "
                      "conditioning drift ~3x at identical throughput; "
                      "pair them for long running-stats runs")
  p.add_argument("--wc_residual_action", default="warn",
                 choices=["warn", "abort", "fallback"],
                 help="what the whitening-health guard does when the "
                      "live Newton-Schulz residual probe crosses 1e-2 "
                      "(or goes non-finite): 'warn' = log and continue "
                      "(default), 'abort' = checkpoint + loud stop like "
                      "the NaN path, 'fallback' = checkpoint, demote "
                      "the active lagged-stats mechanism / escalate NS "
                      "convergence and keep training (d_fake_stats "
                      "running->batch, then 'dr' norms ->'d', then "
                      "ns_iters x2 once — the doubling extends the NS "
                      "convergence envelope ~25x in conditioning, "
                      "docs/SOAK.md r5; aborts once the ladder is "
                      "exhausted). The "
                      "measured ns12 feedback explosion kills a run "
                      "scientifically while losses still look healthy "
                      "(docs/SOAK.md) — 'abort'/'fallback' stop the "
                      "chip-time burn; 'fallback' rescues the run for "
                      "unattended long jobs")
  p.add_argument("--fallback_cooldown", type=int, default=-1,
                 help="outer steps after a fallback rung during which "
                      "further breaches log a recovery line instead of "
                      "escalating — the probe measures the RUNNING "
                      "covariances, which re-converge only at EMA speed "
                      "after a demotion, so without a window one "
                      "transient would burn the whole ladder. -1 = auto "
                      "(ceil(5/(1-wc_momentum)), five EMA time "
                      "constants); 0 = escalate immediately")
  p.add_argument("--residual_probe_every", type=int, default=0,
                 help="ALSO probe whitening health every N outer steps "
                      "inside the epoch (0 = per-epoch only). The "
                      "measured feedback explosion can complete inside "
                      "one long epoch; each probe costs one host sync + "
                      "a CxC covariance fetch per WC layer")
  p.add_argument("--whitening_precision", default="high",
                 choices=["highest", "high"],
                 help="MXU precision of the whitening-path matmuls. "
                      "'high' (3-pass bf16 emulation, default) is a "
                      "measured +3.9%% outer-step throughput at a 20x "
                      "higher (still tiny, ~6e-4) whitening-residual "
                      "floor, soak-validated for 10k steps at the "
                      "config-2 shape; 'highest' (6-pass) is the "
                      "reference-parity mode — see ops/whiten.py")

  # --- evaluation (scorer.py surface [U]) ---
  p.add_argument("--compute_inception_score", type=int, default=0)
  p.add_argument("--compute_fid", type=int, default=0)
  p.add_argument("--score_every", type=int, default=10,
                 help="epochs between IS/FID evaluations")
  p.add_argument("--samples_inception", type=int, default=50000)
  p.add_argument("--samples_fid", type=int, default=10000)
  p.add_argument("--inception_weights", default=None,
                 help="local InceptionV3 weights .npz (no-egress box)")

  # --- TPU options (new capability) ---
  p.add_argument("--platform", default="auto",
                 choices=["auto", "cpu", "tpu", "axon"],
                 help="force a jax platform. NOTE: on this box 'cpu' must "
                      "be selected via this flag (in-process config), not "
                      "the JAX_PLATFORMS env var — the env-var path can "
                      "still route XLA compiles through the TPU tunnel's "
                      "remote-compile hook and stall")
  p.add_argument("--mesh", type=int, default=0,
                 help="data-parallel over N devices (0 = single device)")
  p.add_argument("--bf16", action="store_true",
                 help="bfloat16 compute in G/D (whitening stays f32)")
  p.add_argument("--remat", action="store_true",
                 help="rematerialize res-blocks in backward (memory for "
                      "FLOPs; for big configs / large batch)")
  p.add_argument("--profile_dir", default=None,
                 help="write a jax.profiler trace of a few steps here")
  p.add_argument("--debug_nans", action="store_true",
                 help="jax_debug_nans: fail fast on the op producing a "
                      "NaN (debug builds only; disables some fusion)")
  p.add_argument("--synthetic_size", type=int, default=4096)
  p.add_argument("--synthetic_resolution", type=int, default=None,
                 help="override the synthetic dataset's resolution")
  p.add_argument("--smoke", action="store_true",
                 help="CI smoke mode: swap the dataset for synthetic at "
                      "the same resolution, shrink widths/epochs, keep "
                      "the arch/loss/coloring/mesh semantics — every "
                      "preset runs end-to-end in seconds")
  p.add_argument("--batched_fake_gen", type=int, default=0,
                 help="1 = generate all training_ratio fake batches in "
                      "ONE G forward per outer step (amortizes the "
                      "batch-size-independent Newton-Schulz/fold chain "
                      "5x; whitening moments then see ratio*B rows — "
                      "better statistics, small parity divergence)")
  p.add_argument("--d_fake_stats", type=str, default="batch",
                 choices=["batch", "running"],
                 help="stats source for the D-phase fake-generation "
                      "forwards: 'batch' (reference parity) or "
                      "'running' (eval-mode G — loop-invariant "
                      "whitening lets XLA hoist the moments+NS chain "
                      "out of the D scan; measured +8-13%%, additive, "
                      "not in the reference). CAVEAT (measured, "
                      "docs/SOAK.md r4): 'running' slowly degrades "
                      "covariance conditioning over long runs — fine "
                      "to ~50k outer steps with the live residual "
                      "probe as guard; don't use unmonitored beyond. "
                      "Cold-start: running stats init to (0, I), so "
                      "D-phase fakes are effectively un-whitened for "
                      "~1/(1-momentum) outer steps (~100 at default) "
                      "until the EMA warms up. "
                      "Past ~10k steps pair it with --wc_momentum 0.9 "
                      "(also shortens warm-up to ~10 steps; measured: "
                      "3.2x lower end-of-run residual, "
                      "near-plateaued conditioning, same throughput). "
                      "100k verdict (docs/SOAK.md r5): even paired, "
                      "the residual crosses the 1e-2 warn threshold at "
                      "~66k outer steps and settles ~1.4e-2 (a bounded "
                      "quasi-plateau, NOT the dr/ns12 explosion) — for "
                      ">60k-step runs accept that characterized floor "
                      "with monitoring, or keep the 'batch' default")
  p.add_argument("--device_data", type=int, default=1,
                 help="1 = upload the dataset to device memory once and "
                      "sample minibatches on-device (3x faster through "
                      "this box's TPU tunnel); 0 = host-fed batches")
  p.add_argument("--steps_per_call", type=int, default=8,
                 help="outer steps chained per host dispatch "
                      "(device_data only; amortizes dispatch overhead)")
  p.add_argument("--device_data_limit", type=int, default=2_000_000_000,
                 help="HBM byte budget for device-resident data; larger "
                      "datasets train on a double-buffered rotating "
                      "random window per epoch (two half-budget windows "
                      "in flight, so total window HBM stays within this "
                      "limit)")
  p.add_argument("--compilation_cache_dir", default=".jax_cache",
                 help="persistent XLA compile cache (r3: previously only "
                      "the test suite enabled it — every CLI process "
                      "recompiled from scratch, e.g. ~200 s for the "
                      "2048x2048 FID eigh program alone). '' disables")
  return p


def _parse_filters(spec: Optional[str]):
  if spec is None:
    return None
  return tuple(int(x) for x in spec.split(",") if x)


def _apply_smoke(args) -> None:
  """Shrink a config to CI size in place, preserving its semantics
  (arch, loss, norm/coloring codes, conditionality, mesh, resolution)."""
  res, _, _ = DATASETS[args.dataset]
  args.synthetic_resolution = args.synthetic_resolution or res
  args.dataset = "synthetic"
  args.synthetic_size = min(args.synthetic_size, 64)
  n_dev = args.mesh or 1
  args.batch_size = max(8, 2 * n_dev)  # tiny but mesh-divisible
  args.generator_filters = args.generator_filters or "16,16"
  args.discriminator_filters = args.discriminator_filters or "16,16"
  args.ns_iters = min(args.ns_iters, 6)
  args.number_of_epochs = 2
  args.batches_per_epoch = 2
  args.checkpoint_ratio = 2
  args.display_ratio = 1
  args.steps_per_call = 1
  args.compute_inception_score = 0
  args.compute_fid = 0


def build_experiment(args) -> Trainer:
  """args -> configured Trainer (models, optimizers, dataset, mesh)."""
  if getattr(args, "smoke", False):
    _apply_smoke(args)
  whiten_ops.set_precision(getattr(args, "whitening_precision", "high"))
  conditional = args.conditional or args.gan_type in ("PROJECTIVE",
                                                      "AC_GAN")
  ds = get_dataset(args.dataset, batch_size=args.batch_size,
                   data_dir=args.data_dir, conditional=conditional,
                   seed=args.seed, z_dim=args.z_dim,
                   synthetic_size=args.synthetic_size,
                   synthetic_resolution=getattr(
                       args, "synthetic_resolution", None))
  res = ds.resolution
  num_classes = ds.num_classes
  axis_name = DATA_AXIS if args.mesh else None
  dtype = "bfloat16" if args.bf16 else "float32"

  g_filters = _parse_filters(args.generator_filters) or tuple(
      g_presets(args.arch, res))
  base = res // (2 ** len(g_filters))
  gcfg = GeneratorConfig(
      arch=args.arch, z_dim=args.z_dim, resolution=res,
      output_channels=ds.channels, filters=g_filters,
      base_resolution=base, block_norm=args.generator_block_norm,
      block_coloring=args.generator_block_coloring,
      last_norm=args.generator_last_norm,
      last_coloring=args.generator_last_coloring,
      num_classes=num_classes, filters_emb=args.filters_emb,
      concat_cls=args.generator_concat_cls, ns_iters=args.ns_iters,
      ns_method=args.whitening_method, wc_momentum=args.wc_momentum,
      ns_scaling=args.ns_scaling,
      axis_name=axis_name, dtype=dtype,
      remat=args.remat)

  d_filters = _parse_filters(args.discriminator_filters)
  if d_filters is None:
    d_filters, d_down = d_presets(args.arch, res)
  else:
    d_down = tuple([True] * (len(d_filters) - 1) + [False])
    if args.arch == "res":
      # Block 0 is the optimized block and ALWAYS downsamples; a len-1
      # custom --discriminator_filters would otherwise derive (False,)
      # and trip the config validation (review r3).
      d_down = (True,) + d_down[1:]
  dcfg = DiscriminatorConfig(
      arch=args.arch, resolution=res, input_channels=ds.channels,
      filters=tuple(d_filters), downsample=tuple(d_down),
      spectral=bool(args.discriminator_spectral),
      sn_iters=args.spectral_iterations,
      fully_diff=args.fully_diff_spectral,
      conv_singular=args.conv_singular, norm=args.discriminator_norm,
      coloring=args.discriminator_coloring, num_classes=num_classes,
      filters_emb=args.filters_emb,
      projection=args.gan_type == "PROJECTIVE",
      ac_gan=args.gan_type == "AC_GAN", ns_iters=args.ns_iters,
      ns_method=args.whitening_method, wc_momentum=args.wc_momentum,
      ns_scaling=args.ns_scaling,
      axis_name=axis_name, dtype=dtype, remat=args.remat)

  gan_cfg = GANConfig(
      loss=args.loss,
      gan_type={"GAN": "gan", "PROJECTIVE": "projection",
                "AC_GAN": "acgan"}[args.gan_type],
      training_ratio=args.training_ratio,
      generator_batch_multiple=args.generator_batch_multiple,
      gradient_penalty_weight=(args.gradient_penalty_weight
                               if args.loss == "wgan-gp" else 0.0),
      num_classes=num_classes, z_dim=args.z_dim, axis_name=axis_name,
      sn_update_on_g_step=args.sn_update_on_g_step,
      batched_fake_gen=bool(args.batched_fake_gen),
      d_fake_stats=args.d_fake_stats,
      g_ema_decay=args.generator_ema,
      random_flip=(bool(args.random_flip) if args.random_flip is not None
                   else args.dataset not in ("mnist", "fashion-mnist",
                                             "digits")))

  steps_per_epoch = args.batches_per_epoch or max(
      ds.number_of_batches_per_epoch // args.training_ratio, 1)
  total_outer = steps_per_epoch * args.number_of_epochs
  g_tx = schedules.adam(args.generator_lr, args.beta1, args.beta2,
                        args.lr_decay_schedule, total_outer)
  d_tx = schedules.adam(args.discriminator_lr, args.beta1, args.beta2,
                        args.lr_decay_schedule,
                        total_outer * args.training_ratio)

  name = args.name or (
      f"{args.dataset}_{args.arch}_{args.loss}"
      f"_{args.generator_block_norm}-{args.generator_block_coloring}"
      + ("_cond" if conditional else ""))
  tcfg = TrainerConfig(
      name=name, output_dir=os.path.join(args.output_dir, name),
      checkpoints_dir=args.checkpoints_dir,
      number_of_epochs=args.number_of_epochs,
      start_epoch=args.start_epoch,
      checkpoint_ratio=args.checkpoint_ratio,
      display_ratio=args.display_ratio,
      batches_per_epoch=args.batches_per_epoch, seed=args.seed,
      score_every=args.score_every,
      device_data=bool(args.device_data),
      device_data_limit=args.device_data_limit,
      steps_per_call=args.steps_per_call,
      wc_residual_action=args.wc_residual_action,
      fallback_cooldown=args.fallback_cooldown,
      residual_probe_every=args.residual_probe_every,
      ema_standing_batches=args.ema_standing_stats)

  mesh = None
  if args.mesh:
    mesh = make_mesh(jax.devices()[:args.mesh])

  scorer = None
  if args.compute_inception_score or args.compute_fid:
    from wcgan_tpu.evaluation.scorer import make_scorer
    scorer = make_scorer(
        dataset=ds, compute_is=bool(args.compute_inception_score),
        compute_fid=bool(args.compute_fid),
        samples_inception=args.samples_inception,
        samples_fid=args.samples_fid,
        inception_weights=args.inception_weights, mesh=mesh)

  g = Generator(cfg=gcfg)
  d = Discriminator(cfg=dcfg)
  return Trainer(ds, g, d, g_tx, d_tx, gan_cfg, tcfg, mesh=mesh,
                 scorer=scorer)


def _load_weights_npz(params, path, key_map_path=None, model=None,
                      missing="error", log=None):
  """Load weights-only ``.npz`` (export_weights format) — or a Keras-style
  ``.h5``/``.hdf5``, flattened through ``tools/h5_convert.h5_flat`` with
  the optional ``--checkpoint_key_map`` rename table (reference
  checkpoints load directly, no conversion step) — into a params tree.

  The key-map JSON is either one flat {src: dst} table applied to both
  models, or split per model: {"generator": {...}, "discriminator":
  {...}} — needed because reference Keras files use default layer names
  that collide between G and D (``model`` selects the section). Sources
  prefixed ``re:`` are regex rules — one shared implementation with the
  converter, ``tools.h5_convert.apply_key_map``.

  ``missing='init'`` (--checkpoint_missing) keeps params absent from the
  file at their fresh initialization instead of raising, loudly listing
  both the kept-at-init params and any unused checkpoint keys — the
  migration path across documented checkpoint-tree breaks
  (docs/ROADMAP.md #8/#9) and the analogue of Keras
  ``load_weights(by_name=True)`` partial loading [U]."""
  key_map = None
  if key_map_path:
    import json
    with open(key_map_path) as f:
      key_map = json.load(f)
    if key_map and all(isinstance(v, dict) for v in key_map.values()):
      # Sectioned map. A typo'd section ('generater') or a sectioned map
      # with no entry for this model used to silently yield an EMPTY
      # rename table, surfacing only as downstream missing-key errors
      # (advisor r3) — validate the section names and say what happened.
      valid = {"generator", "discriminator"}
      unknown = sorted(set(key_map) - valid)
      if unknown:
        raise ValueError(
            f"--checkpoint_key_map {key_map_path}: unknown section(s) "
            f"{unknown}; sectioned maps use keys {sorted(valid)}")
      if model not in key_map:
        emit = log or print
        emit(f"checkpoint_key_map: sectioned map {key_map_path} has no "
             f"'{model}' section — no renames applied to this model")
      key_map = key_map.get(model, {})
  from wcgan_tpu.tools.h5_convert import apply_key_map, h5_flat
  if path.endswith((".h5", ".hdf5")):
    loaded = h5_flat(path)
  else:
    loaded = dict(np.load(path))
  loaded = apply_key_map(loaded, key_map)

  used, kept = set(), []

  def sub(keypath, leaf):
    key = "/".join(str(k) for k in keypath)
    if key not in loaded:
      if missing == "init":
        kept.append(key)
        return leaf
      raise KeyError(
          f"checkpoint {path} missing {key} (pass --checkpoint_missing "
          f"init to keep absent params at their initialization)")
    used.add(key)
    arr = loaded[key]
    if arr.shape != leaf.shape:
      raise ValueError(f"{key}: shape {arr.shape} != {leaf.shape}")
    return arr.astype(leaf.dtype)

  out = jax.tree_util.tree_map_with_path(sub, params)
  if kept:
    emit = log or print
    emit(f"checkpoint_missing=init: {len(kept)} {model or 'model'} "
         f"param(s) not in {path}, kept at init: {sorted(kept)}")
    unused = sorted(set(loaded) - used)
    if unused:
      emit(f"  ({len(unused)} checkpoint key(s) unused: {unused})")
  return out


def main(argv=None) -> int:
  import sys as _sys
  argv = list(_sys.argv[1:]) if argv is None else list(argv)
  if "--preset" in argv:
    # --preset <name> expands to the checked-in BASELINE config argv;
    # flags given after it override (argparse last-wins).
    from wcgan_tpu.cli.presets import preset_argv
    i = argv.index("--preset")
    argv = preset_argv(argv[i + 1], argv[:i] + argv[i + 2:])
  args = build_parser().parse_args(argv)
  if args.platform != "auto":
    platform = {"tpu": "axon"}.get(args.platform, args.platform)
    try:
      jax.config.update("jax_platforms", platform)
    except Exception:
      pass
  if args.compilation_cache_dir:
    try:
      jax.config.update("jax_compilation_cache_dir",
                        os.path.abspath(args.compilation_cache_dir))
    except Exception:
      pass  # cache is best-effort; unsupported backends degrade cleanly
  if args.debug_nans:
    jax.config.update("jax_debug_nans", True)
  trainer = build_experiment(args)

  if args.resume == "auto":
    latest = trainer.latest_checkpoint()
    if latest:
      trainer.restore_checkpoint(latest)
      # Infer where to continue unless the user pinned --start_epoch
      # (reference semantics: manual --start_epoch N [U]); without this
      # an auto-resume relabels epochs from 0 and runs a full
      # number_of_epochs more instead of finishing the schedule.
      if args.start_epoch == 0:
        base = os.path.basename(latest.rstrip(os.sep))
        try:
          trainer.cfg.start_epoch = int(base.split("_")[1]) + 1
        except (IndexError, ValueError):
          pass
      trainer.logger.line(f"resumed from {latest} "
                          f"(start_epoch {trainer.cfg.start_epoch})")
  elif args.resume:
    trainer.restore_checkpoint(args.resume)
  if args.generator_checkpoint:
    trainer.state = trainer.state.replace(
        g_params=_load_weights_npz(trainer.state.g_params,
                                   args.generator_checkpoint,
                                   args.checkpoint_key_map,
                                   model="generator",
                                   missing=args.checkpoint_missing,
                                   log=trainer.logger.line))
  if args.discriminator_checkpoint:
    trainer.state = trainer.state.replace(
        d_params=_load_weights_npz(trainer.state.d_params,
                                   args.discriminator_checkpoint,
                                   args.checkpoint_key_map,
                                   model="discriminator",
                                   missing=args.checkpoint_missing,
                                   log=trainer.logger.line))

  if args.phase == "test":
    path = trainer.save_sample_grid(args.start_epoch)
    trainer.logger.line(f"wrote sample grid {path}")
    if trainer.scorer is not None:
      scores = trainer.scorer(trainer)
      trainer.logger.line("; ".join(f"{k} = {v:.4f}"
                                    for k, v in scores.items()))
    return 0

  if args.profile_dir:
    jax.profiler.start_trace(args.profile_dir)
  trainer.train()
  if args.profile_dir:
    jax.profiler.stop_trace()
  return 0


if __name__ == "__main__":
  raise SystemExit(main())
