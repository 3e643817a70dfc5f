#!/usr/bin/env python
"""Bounded TPU-tunnel health probe: one JSON line, never wedges the shell.

The axon relay on this box has two failure modes (CLAUDE.md): a
minutes-long wedge after a mid-RPC kill, and an hours-long claim-park
outage (end-r3) where every new client sleeps forever waiting for a
server-side grant. Burning bench.py's 55-min retry ladder just to learn
"still down" wastes the session — this probe answers in <=timeout
seconds by running ``jax.devices()`` in a watchdogged subprocess.

    python scripts/tunnel_probe.py [--timeout 180]

Prints {"tunnel": "ok", "platform": p, "devices": d, "seconds": t} or
{"tunnel": "wedged", "seconds": timeout}. Exit 0 iff ok — and "ok"
requires the platform to actually be the tunnel (tpu/axon), so a silent
CPU fallback reads as an error, not a live tunnel (review r3).

Kill semantics: a PARKED probe holds no relay connection (measured
end-r3), so stopping it is safe. To also cover the slow-but-live case
(where a hard kill IS a mid-RPC kill that re-poisons the relay), the
watchdog sends SIGTERM first and escalates to SIGKILL only after a
grace period — the client gets to close its connection (review r3).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_INNER = ("import jax; {pin}ds = jax.devices(); "
          "print(ds[0].platform + '|' + ','.join(str(d) for d in ds))")
# JAX_PLATFORMS=cpu in the env does NOT bypass the tunnel here (the
# startup hook registers it first — measured; CLAUDE.md): only the
# in-process config API pins reliably.
_CPU_PIN = "jax.config.update('jax_platforms', 'cpu'); "
_TUNNEL_PLATFORMS = ("tpu", "axon")   # matches tests/test_tpu.py's gate
_GRACE_S = 10


def main() -> int:
  p = argparse.ArgumentParser()
  p.add_argument("--timeout", type=int, default=180)
  p.add_argument("--cpu", action="store_true",
                 help="probe the CPU backend instead (self-test)")
  a = p.parse_args()
  t0 = time.perf_counter()
  inner = _INNER.format(pin=_CPU_PIN if a.cpu else "")
  proc = subprocess.Popen([sys.executable, "-c", inner],
                          stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                          text=True, env=dict(os.environ))
  try:
    stdout, stderr = proc.communicate(timeout=a.timeout)
  except subprocess.TimeoutExpired:
    proc.terminate()                      # SIGTERM: close cleanly if live
    try:
      stdout, stderr = proc.communicate(timeout=_GRACE_S)
    except subprocess.TimeoutExpired:     # parked => holds no connection
      proc.kill()
      proc.communicate()
    print(json.dumps({"tunnel": "wedged",
                      "seconds": round(time.perf_counter() - t0, 1)}))
    return 1
  out = stdout.strip().splitlines()
  platform, devices = "", ""
  if out and "|" in out[-1]:
    platform, devices = out[-1].split("|", 1)
  want = ("cpu",) if a.cpu else _TUNNEL_PLATFORMS
  ok = proc.returncode == 0 and platform in want
  print(json.dumps({
      "tunnel": "ok" if ok else "error",
      "platform": platform, "devices": devices,
      "stderr_tail": stderr[-200:] if not ok else "",
      "seconds": round(time.perf_counter() - t0, 1)}))
  return 0 if ok else 1


if __name__ == "__main__":
  raise SystemExit(main())
