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
# CPU (scripts/baseline_proxy.py: graph-mode TF, Cholesky WC + SN
# ResNet), scaled by the peak-f32-FLOPs CPU->V100 ratio 15.7 TF / 134 GF
# ~= 117x. The proxy was bracketed r5 from BOTH sides (VERDICT r4 #6):
# per-update-dispatch (the reference's sess.run model) measured
# 7.86 (r2) / 9.99-10.22 (r5, uncontended) imgs/sec across sessions, and
# the fully-fused tf.function variant (zero host feeds — an upper bound
# on any TF/Keras implementation here) 10.47-10.52. vs_baseline uses the
# bracket MAX so it stays an honest lower bound; the full range
# (7.6x-10.2x at the r4 headline) is in BASELINE.md.
TF_PROXY_CPU_IMGS_PER_SEC = 10.52    # bracket max, measured 2026-08-19
CPU_TO_V100_PEAK_FLOPS = 117.0       # documented scaling factor
BASELINE_IMGS_PER_SEC = TF_PROXY_CPU_IMGS_PER_SEC * CPU_TO_V100_PEAK_FLOPS


def _emit_failure_json(last_err: str, all_wedged: bool,
                       probe_passed=None) -> None:
  """Print the honest one-JSON-line failure record (driver contract)."""
  dtype = "float32" if "--f32" in sys.argv else "bfloat16"
  if all_wedged and probe_passed:
    # Probe-ok + watchdog-kill is AMBIGUOUS (ADVICE r4): the relay may
    # have wedged after the probe, or the inner 3-measurement workload
    # may have legitimately outrun the watchdog — don't report clean
    # outage evidence the probe just contradicted.
    context = ("pre-flight tunnel probe PASSED but every watchdogged "
               "attempt produced no output in time — ambiguous: either "
               "the relay wedged after the probe or the inner workload "
               "(3 jit compiles + 3 measurements) legitimately exceeded "
               "the watchdog; not clean outage evidence. Last recorded "
               "on-chip sample: 9359.7 imgs/sec b64 (BASELINE.md r4)")
  elif all_wedged:
    # Only the watchdog-timeout signature justifies the outage reading;
    # an inner process that RAN and failed is a code fault and must not
    # hide behind the relay story.
    context = ("all attempts wedged => TPU relay outage (the hours-long "
               "claim-park failure mode, CLAUDE.md), not a code "
               "regression; last recorded on-chip sample of this same "
               "benchmark: 9359.7 imgs/sec b64 / 9725.7 b128 "
               "(vs_baseline 10.18, BASELINE.md round-4 revalidation)")
  else:
    context = ("at least one inner attempt ran and failed (see error "
               "stderr tail) — investigate as a code fault, not a relay "
               "outage")
  print(json.dumps(dict(
      metric="imgs/sec/chip, fused G+D outer step, CIFAR-10 WC-ResNet "
             f"(batch 64, D:G 5:1, {dtype})",
      value=0.0, unit="imgs/sec/chip", vs_baseline=0.0,
      error=f"no measurement: {last_err}", context=context)))


def _run_with_retries(attempts: int = 3, timeout_s: int = 1500,
                      cmd=None, sleep_s: int = 330,
                      probe_cmd=None, probe_timeout_s: int = 180) -> int:
  """Run the measurement in a watchdogged subprocess, retrying on wedge.

  The single-tenant TPU tunnel on this box intermittently wedges a NEW
  process at backend setup (main thread futex-parks at ~0 CPU after
  ~15 s; measured r3, BASELINE.md window-rotation caveat), especially
  right after a previous TPU process was killed. A wedged attempt
  produces no output within ``timeout_s``; it is killed and retried
  after a quiet period. This protects the one-JSON-line driver contract
  from an environment fault — it never retries on a *successful*
  (fast or slow) measurement.

  ``timeout_s`` covers the full inner workload — THREE measurements
  (b64 + b128 + dfake-running), each with its own jit compile (ADVICE
  r4: 900 s sized for one measurement could watchdog-kill a legitimately
  slow triple run and mislabel it an outage; measured warm-cache inner
  wall is ~2-3 min, cold-cache ~6-8 min, so 1500 s gives 3x headroom).

  Fast-fail (VERDICT r3 #1a): BEFORE attempt 1, a bounded tunnel probe
  (scripts/tunnel_probe.py, <=``probe_timeout_s``+grace) checks relay
  health. If the relay is in the hours-long claim-park outage
  (CLAUDE.md), the honest failure JSON is emitted in ~3 min total —
  safely inside any driver window — instead of burning the full
  3x900s+sleeps ladder like BENCH_r03 did (rc=124, no JSON captured).
  Tests inject ``probe_cmd``; a real run probes only when ``cmd`` is
  None (an injected cmd is tunnel-free by construction).
  """
  import os
  import subprocess
  import time as _time
  env = dict(os.environ, WCGAN_BENCH_INNER="1")
  here = os.path.dirname(os.path.abspath(__file__))
  if probe_cmd is None and cmd is None:
    probe_cmd = [sys.executable, os.path.join(here, "scripts",
                                              "tunnel_probe.py"),
                 "--timeout", str(probe_timeout_s)]
  probe_passed = None  # None = no probe ran (injected tunnel-free cmd)
  if probe_cmd is not None:
    try:
      probe = subprocess.run(probe_cmd, capture_output=True, text=True,
                             timeout=probe_timeout_s + 60)
      probe_ok = probe.returncode == 0
      probe_msg = probe.stdout.strip().splitlines()[-1:] or ["(no output)"]
      probe_msg = probe_msg[0]
    except subprocess.TimeoutExpired:
      probe_ok, probe_msg = False, "probe itself timed out"
    probe_passed = probe_ok
    if not probe_ok:
      print(f"tunnel probe failed: {probe_msg}", file=sys.stderr,
            flush=True)
      _emit_failure_json(f"pre-flight tunnel probe failed: {probe_msg}",
                         all_wedged=True, probe_passed=False)
      return 1
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
    # Accept a line as THE measurement only if the inner process exited
    # cleanly AND the line carries the full driver contract — an
    # incidental JSON-ish library log line before a crash must not be
    # reported as success (ADVICE r3).
    if proc.returncode == 0:
      for line in reversed(proc.stdout.splitlines()):
        if not line.startswith("{"):
          continue
        try:
          rec = json.loads(line)
        except ValueError:
          continue
        if all(k in rec for k in ("metric", "value", "unit",
                                  "vs_baseline")):
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
  _emit_failure_json(last_err, all_wedged, probe_passed=probe_passed)
  return 1


def _measure(batch: int, dtype: str, steps: int = 30,
             d_fake_stats: str = "batch") -> float:
  """imgs/sec for the fused outer step at ``batch`` (fresh state/jit)."""
  import jax
  import jax.numpy as jnp

  from wcgan_tpu.train import schedules
  from wcgan_tpu.train.state import create_state
  from wcgan_tpu.train.step import GANConfig, make_jit_step
  from __graft_entry__ import _models

  zdim, res, ratio = 128, 32, 5
  g, d = _models(resolution=res, z_dim=zdim, dtype=dtype)
  cfg = GANConfig(training_ratio=ratio, generator_batch_multiple=2,
                  z_dim=zdim, random_flip=True,
                  d_fake_stats=d_fake_stats)
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

  t0 = time.perf_counter()
  for _ in range(steps):
    state, metrics = step_fn(state, real, labels)
  float(metrics["d_loss"])  # fence: forces the whole step chain
  dt = time.perf_counter() - t0
  return steps * ratio * batch / dt


def main() -> int:
  sys.path.insert(0, ".")
  # bf16 compute (f32 whitening numerics inside) is the TPU-native
  # configuration and the default; --f32 opts out.
  dtype = "float32" if "--f32" in sys.argv else "bfloat16"
  # THE driver metric stays the reference's batch-64 configuration;
  # batch 128 (measured +4%, chip-saturating — BASELINE.md batch-scaling
  # row) rides along as a secondary field (VERDICT r3 #7).
  b64 = _measure(64, dtype)
  record = {
      "metric": "imgs/sec/chip, fused G+D outer step, CIFAR-10 WC-ResNet "
                f"(batch 64, D:G 5:1, {dtype})",
      "value": round(b64, 1),
      "unit": "imgs/sec/chip",
      "vs_baseline": round(b64 / BASELINE_IMGS_PER_SEC, 2),
  }
  if "--no-b128" not in sys.argv:
    record["value_b128"] = round(_measure(128, dtype), 1)
  if "--no-dfake" not in sys.argv:
    # Secondary row: the additive --d_fake_stats running perf mode
    # (D-phase fakes from eval-mode G; +8% measured, BASELINE.md r4
    # ablation). THE metric stays the reference-parity batch-stats
    # configuration at batch 64.
    record["value_dfake_running"] = round(
        _measure(64, dtype, d_fake_stats="running"), 1)
  print(json.dumps(record))
  return 0


if __name__ == "__main__":
  import os
  if os.environ.get("WCGAN_BENCH_INNER"):
    raise SystemExit(main())
  raise SystemExit(_run_with_retries())
