#!/usr/bin/env python
"""Throughput benchmark: imgs/sec/chip for the fused G+D outer step on
CIFAR-10 shapes (the driver metric, BASELINE.json:"metric").

Workload: WC ResNet generator (256x3, whitening + uncond coloring) +
SN ResNet discriminator (128x4), hinge loss, training_ratio=5 D updates +
1 G update (generator_batch_multiple=2) per outer step, batch 64 — the
reference's CIFAR-10 headline configuration [U]. imgs/sec counts real
images consumed per second (training_ratio * batch per outer step).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` divides by a V100 baseline derived from a MEASURED
same-math TF proxy (scripts/baseline_proxy.py) scaled by a documented
CPU->V100 peak-FLOPs factor — see BASELINE.md (the reference never
published throughput; >=5x is the north-star target).
"""

from __future__ import annotations

import json
import sys
import time

# The reference TF/Keras-on-V100 G+D step throughput was never published.
# Denominator = MEASURED same-math reference-style TF proxy on this host's
# CPU (scripts/baseline_proxy.py --impl tf: graph-mode TF, one dispatch +
# host feed per update, Cholesky WC + SN ResNet — 7.86 imgs/sec on the
# 1-core AVX-512 Xeon @2.1GHz), scaled by the peak-f32-FLOPs CPU->V100
# ratio 15.7 TF / 134 GF ~= 117x. Pure-FLOPs scaling ignores the
# reference's fixed per-sess.run host overhead, so this OVERSTATES the
# V100 baseline => vs_baseline is a lower bound. Details in BASELINE.md.
TF_PROXY_CPU_IMGS_PER_SEC = 7.86     # measured 2026-08-16
CPU_TO_V100_PEAK_FLOPS = 117.0       # documented scaling factor
BASELINE_IMGS_PER_SEC = TF_PROXY_CPU_IMGS_PER_SEC * CPU_TO_V100_PEAK_FLOPS


def _run_with_retries(attempts: int = 3, timeout_s: int = 900,
                      cmd=None, sleep_s: int = 330) -> int:
  """Run the measurement in a watchdogged subprocess, retrying on wedge.

  The single-tenant TPU tunnel on this box intermittently wedges a NEW
  process at backend setup (main thread futex-parks at ~0 CPU after
  ~15 s; measured r3, BASELINE.md window-rotation caveat), especially
  right after a previous TPU process was killed. A wedged attempt
  produces no output within ``timeout_s``; it is killed and retried
  after a quiet period. This protects the one-JSON-line driver contract
  from an environment fault — it never retries on a *successful*
  (fast or slow) measurement.
  """
  import os
  import subprocess
  import time as _time
  env = dict(os.environ, WCGAN_BENCH_INNER="1")
  if cmd is None:  # tests inject a tunnel-free inner command
    cmd = [sys.executable, "-u", os.path.abspath(__file__)] + sys.argv[1:]
  last_err = ""
  all_wedged = True
  for attempt in range(attempts):
    try:
      proc = subprocess.run(
          cmd, env=env, capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
      last_err = f"attempt {attempt + 1}: wedged (no output in {timeout_s}s)"
      print(last_err, file=sys.stderr, flush=True)
      if attempt < attempts - 1:
        # CLAUDE.md: recovery needs a FULL quiet period of >=5 min —
        # retrying earlier re-poisons the relay (measured r3). No sleep
        # after the final attempt: nothing retries, report immediately.
        _time.sleep(sleep_s)
      continue
    for line in reversed(proc.stdout.splitlines()):
      if line.startswith("{"):
        print(line)
        return 0
    all_wedged = False   # the inner process RAN and failed — a code
                         # fault, not the watchdog-timeout wedge signature
    last_err = (f"attempt {attempt + 1}: rc={proc.returncode}, no JSON; "
                f"stderr tail: {proc.stderr[-500:]}")
    print(last_err, file=sys.stderr, flush=True)
    if attempt < attempts - 1:
      _time.sleep(60)
  print(f"bench failed after {attempts} attempts: {last_err}",
        file=sys.stderr)
  # Keep the one-JSON-line contract even on total failure so the driver
  # always parses SOMETHING honest. value=0 cannot be mistaken for a
  # measurement; the relay outage seen end-r3 persisted for hours
  # (CLAUDE.md), so all attempts wedging is a real possibility.
  dtype = "float32" if "--f32" in sys.argv else "bfloat16"
  if all_wedged:
    # Only the watchdog-timeout signature justifies the outage reading;
    # an inner process that RAN and failed is a code fault and must not
    # hide behind the relay story.
    context = ("all attempts wedged => TPU relay outage (the hours-long "
               "claim-park failure mode, CLAUDE.md), not a code "
               "regression; last recorded on-chip samples of this same "
               "benchmark: 9647/9685 imgs/sec (vs_baseline 10.5, "
               "BASELINE.md end-of-round-3 sweep)")
  else:
    context = ("at least one inner attempt ran and failed (see error "
               "stderr tail) — investigate as a code fault, not a relay "
               "outage")
  print(json.dumps(dict(
      metric="imgs/sec/chip, fused G+D outer step, CIFAR-10 WC-ResNet "
             f"(batch 64, D:G 5:1, {dtype})",
      value=0.0, unit="imgs/sec/chip", vs_baseline=0.0,
      error=f"no measurement: {last_err}", context=context)))
  return 1


def main() -> int:
  import jax
  import jax.numpy as jnp

  from wcgan_tpu.train import schedules
  from wcgan_tpu.train.state import create_state
  from wcgan_tpu.train.step import GANConfig, make_jit_step
  sys.path.insert(0, ".")
  from __graft_entry__ import _models

  batch, zdim, res, ratio = 64, 128, 32, 5
  # bf16 compute (f32 whitening numerics inside) is the TPU-native
  # configuration and the default; --f32 opts out.
  dtype = "float32" if "--f32" in sys.argv else "bfloat16"
  g, d = _models(resolution=res, z_dim=zdim, dtype=dtype)
  cfg = GANConfig(training_ratio=ratio, generator_batch_multiple=2,
                  z_dim=zdim, random_flip=True)
  g_tx, d_tx = schedules.adam(2e-4), schedules.adam(2e-4)
  state = create_state(g, d, g_tx, d_tx, jax.random.PRNGKey(0),
                       batch_size=batch, z_dim=zdim,
                       image_shape=(res, res, 3))
  step_fn = make_jit_step(g, d, g_tx, d_tx, cfg, donate=True)

  rng = jax.random.PRNGKey(1)
  real = jax.random.randint(rng, (ratio, batch, res, res, 3), 0, 256
                            ).astype(jnp.uint8)
  labels = jnp.zeros((ratio, batch), jnp.int32)

  # Warmup / compile. NOTE: on the axon tunnel platform
  # jax.block_until_ready() does NOT block (remote buffers report ready
  # immediately); a host value fetch is the only reliable fence.
  state, metrics = step_fn(state, real, labels)
  float(metrics["d_loss"])

  steps = 30
  t0 = time.perf_counter()
  for _ in range(steps):
    state, metrics = step_fn(state, real, labels)
  float(metrics["d_loss"])  # fence: forces the whole step chain
  dt = time.perf_counter() - t0

  imgs_per_sec = steps * ratio * batch / dt
  print(json.dumps({
      "metric": "imgs/sec/chip, fused G+D outer step, CIFAR-10 WC-ResNet "
                f"(batch {batch}, D:G {ratio}:1, {dtype})",
      "value": round(imgs_per_sec, 1),
      "unit": "imgs/sec/chip",
      "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 2),
  }))
  return 0


if __name__ == "__main__":
  import os
  if os.environ.get("WCGAN_BENCH_INNER"):
    raise SystemExit(main())
  raise SystemExit(_run_with_retries())
