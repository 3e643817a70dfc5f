#!/usr/bin/env python
"""Stall-watchdog launcher for TPU runs on this box's tunnel.

The single-tenant tunnel relay intermittently wedges a NEW process
during backend setup: it burns ~15-60 s of CPU, then the main thread
futex-parks at ~0 CPU forever, producing no output (observed repeatedly
in r3; CLAUDE.md "TPU runs" bullet). A wedged process never recovers —
the only fix is kill, quiet period, retry.

This wrapper launches a command, watches its *output activity* (stdout/
stderr bytes, forwarded through), and if nothing is produced for
``--stall_timeout`` seconds it kills the child by exact PID, waits
``--cooldown`` seconds for the relay to recover, and retries. It never
kills a child that is producing output, however slowly — so long
training runs are safe as long as they log per epoch (the Trainer
does).

Usage:
    python scripts/tpu_launch.py [--stall_timeout 900] [--cooldown 330]
        [--attempts 3] -- python -u run.py ...

bench.py carries its own equivalent armor (one-JSON-line driver
contract); this is the general tool for soaks / scoring / ad-hoc runs.
"""

from __future__ import annotations

import argparse
import os
import select
import signal
import subprocess
import sys
import time


def run_once(cmd, stall_timeout: float) -> int | None:
  """Run cmd, forwarding output. Returns exit code, or None on stall."""
  proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT,
                          start_new_session=True)
  last_output = time.monotonic()
  fd = proc.stdout.fileno()
  while True:
    ready, _, _ = select.select([fd], [], [], 5.0)
    if ready:
      chunk = os.read(fd, 65536)
      if chunk:
        sys.stdout.buffer.write(chunk)
        sys.stdout.buffer.flush()
        last_output = time.monotonic()
      else:  # EOF
        return proc.wait()
    if proc.poll() is not None and not ready:
      return proc.returncode
    if time.monotonic() - last_output > stall_timeout:
      # Wedged: kill the whole process group (we started a new session,
      # so this cannot touch anything but the child tree).
      try:
        os.killpg(proc.pid, signal.SIGTERM)
        time.sleep(5)
        os.killpg(proc.pid, signal.SIGKILL)
      except ProcessLookupError:
        pass
      proc.wait()
      return None


def main() -> int:
  ap = argparse.ArgumentParser()
  ap.add_argument("--stall_timeout", type=float, default=900.0,
                  help="seconds without ANY child output => wedged")
  ap.add_argument("--cooldown", type=float, default=330.0,
                  help="relay recovery wait between attempts")
  ap.add_argument("--attempts", type=int, default=3)
  ap.add_argument("cmd", nargs=argparse.REMAINDER,
                  help="-- command to run")
  a = ap.parse_args()
  cmd = a.cmd[1:] if a.cmd and a.cmd[0] == "--" else a.cmd
  if not cmd:
    ap.error("no command given (use: tpu_launch.py [opts] -- cmd ...)")

  for attempt in range(1, a.attempts + 1):
    rc = run_once(cmd, a.stall_timeout)
    if rc is not None:
      return rc
    last = attempt == a.attempts
    print(f"[tpu_launch] attempt {attempt}: stalled "
          f"(no output for {a.stall_timeout:.0f}s); killed"
          + ("" if last else f"; cooling down {a.cooldown:.0f}s"),
          file=sys.stderr, flush=True)
    if not last:  # no retry follows the final attempt — report now
      time.sleep(a.cooldown)
  print(f"[tpu_launch] giving up after {a.attempts} stalled attempts",
        file=sys.stderr)
  return 124


if __name__ == "__main__":
  raise SystemExit(main())
