#!/usr/bin/env python
"""One-command on-chip revalidation after a relay outage or model change.

Runs, STRICTLY SERIALIZED (the tunnel is single-tenant; CLAUDE.md):
  1. scripts/tunnel_probe.py      — abort early if the relay is down
  2. bench.py                     — headline imgs/sec (self-armored)
  3. scripts/mfu.py               — FLOPs + MFU of the same step
  4. the on-TPU pytest lane       — WCGAN_TEST_TPU=1, tests/test_tpu.py

Prints one JSON summary line with each stage's parsed result (or error)
so the outcome can be pasted into BASELINE.md. Written end-r3, when the
generator-shortcut parity fix landed during an hours-long relay outage
and the post-fix on-chip numbers could not be taken; the next session
with a live tunnel should start here.

    python scripts/revalidate_tpu.py [--skip-tests] [--probe-timeout 180]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))


def _run(cmd, timeout_s, **env_extra):
  env = dict(os.environ, **env_extra)
  t0 = time.perf_counter()
  try:
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          timeout=timeout_s, cwd=ROOT, env=env)
  except subprocess.TimeoutExpired:
    return dict(error=f"timeout after {timeout_s}s",
                seconds=round(time.perf_counter() - t0, 1))
  out = dict(rc=proc.returncode,
             seconds=round(time.perf_counter() - t0, 1))
  for line in reversed(proc.stdout.strip().splitlines()):
    if line.startswith("{"):
      try:
        out["json"] = json.loads(line)
      except ValueError:
        pass
      break
  if proc.returncode != 0 and "json" not in out:
    out["stderr_tail"] = proc.stderr[-300:]
  out.setdefault("stdout_tail", proc.stdout.strip()[-200:])
  return out


def main() -> int:
  p = argparse.ArgumentParser()
  p.add_argument("--skip-tests", action="store_true")
  p.add_argument("--probe-timeout", type=int, default=180)
  a = p.parse_args()
  py = sys.executable
  summary = {}

  probe = _run([py, "scripts/tunnel_probe.py",
                "--timeout", str(a.probe_timeout)],
               a.probe_timeout + 60)
  summary["probe"] = probe
  if probe.get("rc") != 0:
    print(json.dumps(dict(ok=False, stage="probe", **summary)))
    return 1

  # Each TPU stage runs ONLY if the previous one succeeded: a failed or
  # watchdog-killed stage means the relay needs a full quiet period
  # (CLAUDE.md), and launching the next stage immediately would
  # re-poison it — abort and report instead (review r3).
  stages = [("bench", [py, "bench.py"], 4200, {}),
            ("mfu", [py, "scripts/mfu.py"], 1500, {})]
  if not a.skip_tests:
    stages.append(("tpu_tests",
                   [py, "-m", "pytest", "tests/test_tpu.py", "-m", "tpu",
                    "-q"], 1800, {"WCGAN_TEST_TPU": "1"}))
  for i, (name, cmd, timeout_s, env_extra) in enumerate(stages):
    summary[name] = _run(cmd, timeout_s, **env_extra)
    if summary[name].get("rc") != 0:
      remaining = [s[0] for s in stages[i + 1:]]
      print(json.dumps(dict(
          ok=False, stage=name,
          aborted=remaining,
          note="stage failed; remaining TPU stages skipped — give the "
               "relay a >=5-min full quiet period before retrying",
          **summary)))
      return 1
  print(json.dumps(dict(ok=True, **summary)))
  return 0


if __name__ == "__main__":
  raise SystemExit(main())
