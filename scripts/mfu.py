#!/usr/bin/env python
"""MFU of the fused G+D outer step on the real chip (VERDICT r1 #4;
generalized to every BASELINE config shape r5 — VERDICT r4 #1 asked for
an efficiency story beyond the headline CIFAR shape).

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
    python scripts/mfu.py [--config headline|cfg1..cfg5] [--f32]
Prints one JSON line per run; record results in BASELINE.md.
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
  p.add_argument("--config", default="headline",
                 help="headline (bench.py shape) or cfg1..cfg5 "
                      "(BASELINE per-chip config shapes; "
                      "tools/bench_shapes.py)")
  p.add_argument("--f32", action="store_true")
  p.add_argument("--steps", type=int, default=30)
  p.add_argument("--batch", type=int, default=64)
  a = p.parse_args()

  sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
  from wcgan_tpu.tools.bench_shapes import build_bench

  dtype = "float32" if a.f32 else "bfloat16"
  step_fn, state, (real, labels), spec = build_bench(
      a.config, batch=a.batch, dtype=dtype, donate=False)
  ratio = spec["ratio"]

  # FLOPs are counted on the UNROLLED-D-scan variant of the same math:
  # XLA's cost_analysis counts a while/scan body ONCE (the trip count is
  # opaque to it), so the production lax.scan program under-reports the
  # K D updates Kx — measured r3: scan 1.990 TFLOP at BOTH ratio=1 and
  # ratio=5, unrolled ratio=5 3.764 TFLOP. The r1/r2 MFU rows (28.9%)
  # carried this undercount; true MFU is ~2x higher.
  count_fn, count_state, _, _ = build_bench(
      a.config, batch=a.batch, dtype=dtype, donate=False,
      unroll_d_scan=True)
  del count_state
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
      config=a.config, dtype=dtype, batch=a.batch, ratio=ratio,
      res=spec["res"], ncls=spec["ncls"],
      flops_per_outer_step=flops,
      step_ms=round(dt * 1e3, 3),
      imgs_per_sec=round(ratio * a.batch / dt, 1),
      model_tflops_per_sec=round(flops / dt / 1e12, 2),
      peak_tflops=V5E_PEAK_FLOPS / 1e12,
      mfu=round(mfu, 4))))
  return 0


if __name__ == "__main__":
  raise SystemExit(main())
