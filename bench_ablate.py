#!/usr/bin/env python
"""Ablation bench: isolate where outer-step time goes on the real chip.

Variants: norm in G (whitening 'd' vs BN 'b' vs none 'n'), f32 vs bf16,
Newton-Schulz iteration count. Prints one JSON line per variant.
Timing fence = host scalar fetch (block_until_ready is a no-op on the
axon tunnel platform — see bench.py)."""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from wcgan_tpu.models.discriminator import Discriminator, DiscriminatorConfig
from wcgan_tpu.models.generator import Generator, GeneratorConfig
from wcgan_tpu.train import schedules
from wcgan_tpu.train.state import create_state
from wcgan_tpu.train.step import GANConfig, make_jit_step


def bench_variant(norm: str, dtype: str, ns_iters: int,
                  batch=64, zdim=128, res=32, ratio=5, steps=20,
                  unroll=False, whitening_precision="high",
                  d_fake_stats="batch", ns_scaling="trace",
                  remat=False, random_flip=True, batched_fake_gen=False,
                  opt="adam"):
  # whitening_precision default matches the shipped product default
  # (HIGH since r3) so default ablation rows measure the same config as
  # bench.py/mfu.py; pass "highest" explicitly for the parity mode.
  from wcgan_tpu.ops import whiten as whiten_ops
  whiten_ops.set_precision(whitening_precision)
  gcfg = GeneratorConfig(
      z_dim=zdim, resolution=res, base_resolution=4,
      filters=(256, 256, 256), block_norm=norm,
      last_norm=norm, ns_iters=ns_iters, dtype=dtype,
      ns_scaling=ns_scaling, remat=remat,
      block_coloring="uconv", last_coloring="uconv")
  dcfg = DiscriminatorConfig(
      resolution=res, filters=(128, 128, 128, 128),
      downsample=(True, True, False, False), ns_iters=ns_iters,
      ns_scaling=ns_scaling, dtype=dtype)
  g, d = Generator(cfg=gcfg), Discriminator(cfg=dcfg)
  cfg = GANConfig(training_ratio=ratio, generator_batch_multiple=2,
                  z_dim=zdim, random_flip=random_flip,
                  unroll_d_scan=unroll, batched_fake_gen=batched_fake_gen,
                  d_fake_stats=d_fake_stats)
  if opt == "sgd":
    # Optimizer-cost probe (--gap): plain SGD instead of the two Adams —
    # if throughput is identical, the Adam math is fused/free.
    import optax
    g_tx, d_tx = optax.sgd(2e-4), optax.sgd(2e-4)
  else:
    g_tx, d_tx = schedules.adam(2e-4), schedules.adam(2e-4)
  state = create_state(g, d, g_tx, d_tx, jax.random.PRNGKey(0),
                       batch_size=batch, z_dim=zdim,
                       image_shape=(res, res, 3))
  step_fn = make_jit_step(g, d, g_tx, d_tx, cfg, donate=True)
  real = jax.random.randint(jax.random.PRNGKey(1),
                            (ratio, batch, res, res, 3), 0, 256
                            ).astype(jnp.uint8)
  labels = jnp.zeros((ratio, batch), jnp.int32)
  state, metrics = step_fn(state, real, labels)
  float(metrics["d_loss"])
  t0 = time.perf_counter()
  for _ in range(steps):
    state, metrics = step_fn(state, real, labels)
  float(metrics["d_loss"])
  dt = time.perf_counter() - t0
  return steps * ratio * batch / dt


def bench_sampling(dtype: str, batch=256, zdim=128, res=32, ns_iters=15,
                   steps=30):
  """Sampling/eval path (the scorer's workload): G.apply(train=False) on
  running stats, fused whiten_color_apply kernel AUTO vs forced OFF
  (VERDICT r1 #3 evidence). The gate is patched at the module level —
  it is read at trace time, so each variant jits its own program."""
  from wcgan_tpu.models import layers as L
  gcfg = GeneratorConfig(
      z_dim=zdim, resolution=res, base_resolution=4,
      filters=(256, 256, 256), block_norm="d", last_norm="d",
      ns_iters=ns_iters, dtype=dtype, block_coloring="uconv",
      last_coloring="uconv")
  g = Generator(cfg=gcfg)
  z = jax.random.normal(jax.random.PRNGKey(0), (batch, zdim), jnp.float32)
  variables = g.init(jax.random.PRNGKey(1), z, train=True)

  out = {}
  orig = L._pallas_eval_ok
  # Force each variant explicitly: the product default is now the split
  # path (this bench is why), so "fused_kernel" must force the kernel on.
  for name, gate in (("fused_kernel",
                      lambda pe, m: m == "newton_schulz"),
                     ("xla_split", lambda *_: False)):
    L._pallas_eval_ok = gate
    try:
      fn = jax.jit(lambda v, zz: g.apply(v, zz, train=False))
      imgs = fn(variables, z)
      float(imgs[0, 0, 0, 0])  # fence
      t0 = time.perf_counter()
      for _ in range(steps):
        imgs = fn(variables, z)
      float(imgs[0, 0, 0, 0])
      out[name] = steps * batch / (time.perf_counter() - t0)
    finally:
      L._pallas_eval_ok = orig
  return out


def bench_shape(config: str, batch=64, steps=20, d_fake_stats="batch",
                ns_scaling="trace", ns_iters=15, block_norm="d"):
  """Fused-step throughput at one BASELINE config shape (paper §5
  widths; construction single-sourced in tools/bench_shapes so MFU and
  attribution measure the same program — VERDICT r4 #1)."""
  from wcgan_tpu.tools.bench_shapes import build_bench
  step_fn, state, (real, labels), spec = build_bench(
      config, batch=batch, d_fake_stats=d_fake_stats,
      ns_scaling=ns_scaling, ns_iters=ns_iters, block_norm=block_norm)
  state, metrics = step_fn(state, real, labels)
  float(metrics["d_loss"])
  t0 = time.perf_counter()
  for _ in range(steps):
    state, metrics = step_fn(state, real, labels)
  float(metrics["d_loss"])
  return steps * spec["ratio"] * batch / (time.perf_counter() - t0)


def main():
  if "--swing" in sys.argv:
    # VERDICT r2 #4: measured candidate swings at the bf16 headline
    # shape, back-to-back for comparability.
    # All rows run the shipped HIGH precision default unless named
    # otherwise (pre-r3 archives of these rows ran 'highest' baselines —
    # the ns15_highest_b64 row keeps the precision contrast measurable).
    swings = [
        ("baseline_ns15_b64", dict(ns_iters=15)),
        ("ns15_highest_b64", dict(ns_iters=15,
                                  whitening_precision="highest")),
        ("ns12_b64", dict(ns_iters=12)),
        ("unroll_dscan_b64", dict(ns_iters=15, unroll=True)),
        ("baseline_ns15_b128", dict(ns_iters=15, batch=128)),
        ("ns12_b128", dict(ns_iters=12, batch=128)),
    ]
    for name, kw in swings:
      v = bench_variant("d", "bfloat16", **kw)
      print(json.dumps({"swing": name, "imgs_per_sec": round(v, 1)}),
            flush=True)
    return
  if "--dfake" in sys.argv:
    # --d_fake_stats A/B at the headline shape: D-phase fakes from
    # train-mode G (batch stats, reference parity) vs eval-mode G
    # (running stats — the NS/fold chain is loop-invariant across the
    # D scan and hoistable). Interleaved, two rounds each.
    for rnd in range(2):
      for mode in ("batch", "running"):
        v = bench_variant("d", "bfloat16", ns_iters=15,
                          d_fake_stats=mode)
        print(json.dumps({"swing": f"dfake_{mode}_r{rnd}",
                          "imgs_per_sec": round(v, 1)}), flush=True)
    return
  if "--nsscale" in sys.argv:
    # --ns_scaling A/B, interleaved two rounds each (same protocol as
    # --dfake: cross-session chip variance is larger than the effects
    # under test, so never compare across sessions). Two shapes: the
    # headline uncond bf16 shape (batch stats, NS inside the D scan ×5)
    # and the conditional config-2 shape under d_fake_stats=running
    # (NS hoisted — the pairing the fro knob is recommended for).
    for rnd in range(2):
      for scaling in ("trace", "fro"):
        v = bench_variant("d", "bfloat16", ns_iters=15,
                          ns_scaling=scaling)
        print(json.dumps({"swing": f"nsscale_{scaling}_headline_r{rnd}",
                          "imgs_per_sec": round(v, 1)}), flush=True)
    for rnd in range(2):
      for scaling in ("trace", "fro"):
        v = bench_shape("cfg2", d_fake_stats="running",
                        ns_scaling=scaling)
        print(json.dumps({"swing": f"nsscale_{scaling}_cfg2run_r{rnd}",
                          "imgs_per_sec": round(v, 1)}), flush=True)
    return
  if "--modes" in sys.argv:
    # VERDICT r4 #5: at-shape evidence for the `dr` (whiten from
    # running stats) and `b` (plain BN) norm modes — unit-tested since
    # r1 but never measured on chip. Interleaved, two rounds each, at
    # the headline shape; plus d-vs-dr at the conditional cfg2 shape
    # (dr's EMA-lagged whitening is the mechanism behind the
    # d_fake_stats=running drift, so cfg2 is where it matters).
    for rnd in range(2):
      for norm in ("d", "dr", "b"):
        v = bench_variant(norm, "bfloat16", ns_iters=15)
        print(json.dumps({"swing": f"mode_{norm}_headline_r{rnd}",
                          "imgs_per_sec": round(v, 1)}), flush=True)
    for rnd in range(2):
      for norm in ("d", "dr"):
        v = bench_shape("cfg2", block_norm=norm)
        print(json.dumps({"swing": f"mode_{norm}_cfg2_r{rnd}",
                          "imgs_per_sec": round(v, 1)}), flush=True)
    return
  if "--acgan" in sys.argv:
    # VERDICT r4 #4: AC-GAN at shape, with the projection-D cfg2 row as
    # the interleaved control (same G; D differs by aux head vs
    # projection embedding).
    for rnd in range(2):
      for key in ("cfg2", "acgan"):
        v = bench_shape(key)
        print(json.dumps({"swing": f"{key}_r{rnd}",
                          "imgs_per_sec": round(v, 1)}), flush=True)
    return
  if "--gap" in sys.argv:
    # VERDICT r4 #2: attack the measured ~38% gap between the headline
    # step (34.36 ms) and its op-mix ceiling (~20.6 ms). Each candidate
    # is an interleaved A/B against the in-batch baseline:
    #   remat_g      — G-block remat: backward recomputes activations
    #                  (incl. the whitening chain) instead of saving them
    #   noflip       — on-device flip+prep glue cost
    #   sgd_opt      — the 2 Adams vs plain SGD (optimizer-fusion check)
    #   run          — d_fake_stats=running control (hoists NS chain)
    #   bfg_run      — + batched_fake_gen: ONE ratio*B G forward per
    #                  outer step, moment passes cut to 1/outer-step
    gap = [
        ("baseline", dict()),
        ("remat_g", dict(remat=True)),
        ("noflip", dict(random_flip=False)),
        ("sgd_opt", dict(opt="sgd")),
        ("run", dict(d_fake_stats="running")),
        ("bfg_run", dict(d_fake_stats="running", batched_fake_gen=True)),
    ]
    for rnd in range(2):
      for name, kw in gap:
        v = bench_variant("d", "bfloat16", ns_iters=15, **kw)
        print(json.dumps({"swing": f"gap_{name}_r{rnd}",
                          "imgs_per_sec": round(v, 1)}), flush=True)
    return
  if "--shapes" in sys.argv:
    # One row per BASELINE config's per-chip shape: 1 = DCGAN ns 1:1,
    # 2 = cond cWC + projection (see the conditional-fold ablation for
    # its history), 3 = STL 48px, 4 = Tiny-ImageNet 64px/200c,
    # 5 = ImageNet-64 per-chip shape (64px, 1000 classes; cWC via the
    # -sa parameterization — plain ucconv at 1000c is 970M G params /
    # 3.9 GB f32, per-chip infeasible at paper widths; see
    # cli/presets.py's measured note).
    shapes = (
        ("cifar10_wc_dcgan_cfg1", "cfg1"),
        ("cifar10_cwc_proj_cfg2", "cfg2"),
        ("stl10_uncond_48_cfg3", "cfg3"),
        ("tiny_imagenet_cwcsa_64_cfg4", "cfg4"),
        ("imagenet64_cwcsa_perchip_cfg5", "cfg5"))
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    dfake = "running" if "--dfake-running" in sys.argv else "batch"
    for name, key in shapes:
      if only and not any(o in name for o in only):
        continue
      v = bench_shape(key, d_fake_stats=dfake)
      rec = {"config": name, "imgs_per_sec": round(v, 1)}
      if dfake != "batch":
        rec["d_fake_stats"] = dfake
      print(json.dumps(rec), flush=True)
    return
  if "--sampling" in sys.argv:
    for dtype in ("bfloat16", "float32"):
      r = bench_sampling(dtype)
      print(json.dumps({"mode": "sampling", "dtype": dtype,
                        **{k: round(v, 1) for k, v in r.items()}}),
            flush=True)
    return
  variants = [
      ("d", "float32", 15), ("d", "bfloat16", 15),
      ("b", "float32", 15), ("n", "float32", 15),
      ("d", "bfloat16", 8), ("b", "bfloat16", 15), ("n", "bfloat16", 15),
  ]
  if "--quick" in sys.argv:
    variants = variants[:2]
  for norm, dtype, ns in variants:
    v = bench_variant(norm, dtype, ns)
    print(json.dumps({"norm": norm, "dtype": dtype, "ns_iters": ns,
                      "imgs_per_sec": round(v, 1)}), flush=True)


if __name__ == "__main__":
  main()
