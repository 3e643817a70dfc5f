#!/usr/bin/env python
"""MFU of the fused G+D outer step on the real chip (VERDICT r1 #4).

Model FLOPs per outer step come from XLA's own cost analysis of the
compiled program (``compiled.cost_analysis()['flops']`` — counts the
model math, not any recompute XLA chooses to add, which is the MFU
convention). Step time is measured like bench.py (host-scalar fence —
``block_until_ready`` does not fence on the axon tunnel, CLAUDE.md).

Peak used for the denominator: TPU v5e = 197 TFLOP/s bf16, and the same
MXU figure for f32 inputs (XLA upcasts f32 matmuls into multi-pass bf16;
a pure-f32 'peak' is not published for v5e, so f32 MFU reads low — the
bf16 row is the headline).

Run serialized with other TPU work (single-tenant tunnel):
    python scripts/mfu.py [--f32]
Prints one JSON line; record the result in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

V5E_PEAK_FLOPS = 197e12  # bf16 MXU peak, TPU v5e (public spec)


def main() -> int:
  p = argparse.ArgumentParser()
  p.add_argument("--f32", action="store_true")
  p.add_argument("--steps", type=int, default=30)
  a = p.parse_args()

  import jax
  import jax.numpy as jnp

  sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
  from __graft_entry__ import _models
  from wcgan_tpu.train import schedules
  from wcgan_tpu.train.state import create_state
  from wcgan_tpu.train.step import GANConfig, make_jit_step

  batch, zdim, res, ratio = 64, 128, 32, 5
  dtype = "float32" if a.f32 else "bfloat16"
  g, d = _models(resolution=res, z_dim=zdim, dtype=dtype)
  cfg = GANConfig(training_ratio=ratio, generator_batch_multiple=2,
                  z_dim=zdim, random_flip=True)
  g_tx, d_tx = schedules.adam(2e-4), schedules.adam(2e-4)
  state = create_state(g, d, g_tx, d_tx, jax.random.PRNGKey(0),
                       batch_size=batch, z_dim=zdim,
                       image_shape=(res, res, 3))
  step_fn = make_jit_step(g, d, g_tx, d_tx, cfg, donate=False)
  real = jax.random.randint(jax.random.PRNGKey(1),
                            (ratio, batch, res, res, 3), 0, 256
                            ).astype(jnp.uint8)
  labels = jnp.zeros((ratio, batch), jnp.int32)

  # make_jit_step returns a jax.jit-wrapped callable => .lower() exists.
  # FLOPs are counted on the UNROLLED-D-scan variant of the same math:
  # XLA's cost_analysis counts a while/scan body ONCE (the trip count is
  # opaque to it), so the production lax.scan program under-reports the
  # 5 D updates 5x — measured r3: scan 1.990 TFLOP at BOTH ratio=1 and
  # ratio=5, unrolled ratio=5 3.764 TFLOP. The r1/r2 MFU rows (28.9%)
  # carried this undercount; true MFU is ~2x higher.
  import dataclasses
  count_fn = make_jit_step(g, d, g_tx, d_tx,
                           dataclasses.replace(cfg, unroll_d_scan=True),
                           donate=False)
  cost = count_fn.lower(state, real, labels).compile().cost_analysis()
  if isinstance(cost, list):  # older jax returns one dict per device
    cost = cost[0]
  flops = float(cost["flops"])

  state, metrics = step_fn(state, real, labels)
  float(metrics["d_loss"])  # fence
  t0 = time.perf_counter()
  for _ in range(a.steps):
    state, metrics = step_fn(state, real, labels)
  float(metrics["d_loss"])
  dt = (time.perf_counter() - t0) / a.steps

  mfu = flops / dt / V5E_PEAK_FLOPS
  print(json.dumps(dict(
      dtype=dtype, flops_per_outer_step=flops,
      step_ms=round(dt * 1e3, 3),
      imgs_per_sec=round(ratio * batch / dt, 1),
      model_tflops_per_sec=round(flops / dt / 1e12, 2),
      peak_tflops=V5E_PEAK_FLOPS / 1e12,
      mfu=round(mfu, 4))))
  return 0


if __name__ == "__main__":
  raise SystemExit(main())
