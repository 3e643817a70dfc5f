#!/usr/bin/env python
"""Bounded TPU-tunnel health probe: one JSON line, never wedges the shell.

The axon relay on this box has two failure modes (CLAUDE.md): a
minutes-long wedge after a mid-RPC kill, and an hours-long claim-park
outage (end-r3) where every new client sleeps forever waiting for a
server-side grant. Burning bench.py's 55-min retry ladder just to learn
"still down" wastes the session — this probe answers in <=timeout
seconds by running ``jax.devices()`` in a watchdogged subprocess.

    python scripts/tunnel_probe.py [--timeout 180]

Prints {"tunnel": "ok", "devices": [...], "seconds": t} or
{"tunnel": "wedged", "seconds": timeout}. Exit 0 iff ok. Safe to kill:
a parked probe never established the relay connection (measured end-r3
— no TCP to the relay port while parked), so killing it does not
re-poison the relay the way killing a mid-RPC training process does.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_INNER = "import jax; {pin}print([str(d) for d in jax.devices()])"
# JAX_PLATFORMS=cpu in the env does NOT bypass the tunnel here (the
# startup hook registers it first — measured; CLAUDE.md): only the
# in-process config API pins reliably.
_CPU_PIN = "jax.config.update('jax_platforms', 'cpu'); "


def main() -> int:
  p = argparse.ArgumentParser()
  p.add_argument("--timeout", type=int, default=180)
  p.add_argument("--cpu", action="store_true",
                 help="probe the CPU backend instead (self-test)")
  a = p.parse_args()
  t0 = time.perf_counter()
  try:
    inner = _INNER.format(pin=_CPU_PIN if a.cpu else "")
    proc = subprocess.run([sys.executable, "-c", inner],
                          capture_output=True, text=True,
                          timeout=a.timeout, env=dict(os.environ))
  except subprocess.TimeoutExpired:
    print(json.dumps({"tunnel": "wedged",
                      "seconds": round(time.perf_counter() - t0, 1)}))
    return 1
  out = proc.stdout.strip().splitlines()
  ok = (proc.returncode == 0 and bool(out)
        and out[-1].startswith("["))  # the devices list printed
  print(json.dumps({
      "tunnel": "ok" if ok else "error",
      "devices": out[-1] if out else "",
      "stderr_tail": proc.stderr[-200:] if not ok else "",
      "seconds": round(time.perf_counter() - t0, 1)}))
  return 0 if ok else 1


if __name__ == "__main__":
  raise SystemExit(main())
