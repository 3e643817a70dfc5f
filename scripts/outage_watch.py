#!/usr/bin/env python
"""Mechanized relay-outage protocol: bounded probes on a schedule, one
JSONL line per probe, optional auto-revalidation on recovery.

The end-r3 relay outage spanned SESSIONS (6 bench attempts over ~3 h on
2026-08-17, then 4 hourly probes 06:20-09:15 the next session, all
wedged — CLAUDE.md), and the playbook lived only in prose. This script
turns it into data + automation (VERDICT r3 task #5):

  * each cycle runs ``scripts/tunnel_probe.py`` (bounded, <=180 s,
    SIGTERM-first kill semantics — never wedges the shell), and appends
    ONE JSONL line to the log: {"ts": iso8601, "tunnel": ..., ...};
  * on the FIRST "ok" probe it can auto-trigger
    ``scripts/revalidate_tpu.py`` (the serialized post-outage on-chip
    sweep) and log its one-line summary, then exit — so a session parked
    on an outage lands the deferred measurements the moment the grant
    clears, without a human polling;
  * probes are spaced ``--interval`` seconds apart (default 3600:
    CLAUDE.md says retry HOURLY during the deep claim-park outage —
    tighter loops re-poison the minutes-class wedge and learn nothing
    about the hours-class one).

    python scripts/outage_watch.py --once            # one probe + log
    python scripts/outage_watch.py --on-recovery revalidate
    python scripts/outage_watch.py --max-probes 24   # bound a session

The log (default ``docs/outage_log.jsonl``) is the outage-duration
record the prose playbook never had: wall-clock timestamps of every
down/up observation, so the NEXT episode's length is measured, not
anecdotal.

Timestamps use the host wall clock (time.time) — fine here; this script
runs outside any jit/trace context.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import shlex
import subprocess
import sys
import time

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
DEFAULT_LOG = os.path.join("docs", "outage_log.jsonl")


def _iso(ts: float) -> str:
  return datetime.datetime.fromtimestamp(
      ts, datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def _probe(timeout_s: int, probe_cmd=None) -> dict:
  """One bounded tunnel probe; returns the probe's parsed JSON line
  (or a synthetic error record — the probe itself never hangs, but its
  output contract is defended anyway). ``probe_cmd`` overrides the real
  tunnel probe (tests; also `--probe-cmd` for a CPU self-test)."""
  if probe_cmd is None:
    probe_cmd = [sys.executable, "scripts/tunnel_probe.py",
                 "--timeout", str(timeout_s)]
  try:
    proc = subprocess.run(
        probe_cmd,
        capture_output=True, text=True, cwd=ROOT,
        timeout=timeout_s + 60)
  except subprocess.TimeoutExpired:
    return {"tunnel": "probe-hung", "seconds": timeout_s + 60}
  for line in reversed(proc.stdout.strip().splitlines()):
    if line.startswith("{"):
      try:
        return json.loads(line)
      except ValueError:
        break
  return {"tunnel": "probe-error", "rc": proc.returncode,
          "stderr_tail": proc.stderr[-200:]}


def _append(log_path: str, record: dict) -> None:
  os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
  with open(log_path, "a") as f:
    f.write(json.dumps(record) + "\n")


def main() -> int:
  p = argparse.ArgumentParser()
  p.add_argument("--interval", type=int, default=3600,
                 help="seconds between probes (CLAUDE.md: hourly)")
  p.add_argument("--probe-timeout", type=int, default=180)
  p.add_argument("--log", default=DEFAULT_LOG,
                 help="JSONL log path, relative to repo root")
  p.add_argument("--once", action="store_true",
                 help="one probe + one log line, then exit")
  p.add_argument("--max-probes", type=int, default=0,
                 help="stop after N probes (0 = until recovery)")
  p.add_argument("--on-recovery", choices=("none", "revalidate"),
                 default="none",
                 help="run scripts/revalidate_tpu.py on first ok probe")
  p.add_argument("--revalidate-timeout", type=int, default=8100,
                 help="cap for the revalidation sweep (its stages "
                      "self-bound at ~7.7k s worst case)")
  p.add_argument("--probe-cmd", default=None,
                 help="override the probe command (shell-split; tests / "
                      "CPU self-probe)")
  a = p.parse_args()
  # shlex: interpreter/script paths with spaces must be expressible
  # (ADVICE r4 — str.split() could not quote them).
  probe_cmd = shlex.split(a.probe_cmd) if a.probe_cmd else None
  log_path = a.log if os.path.isabs(a.log) else os.path.join(ROOT, a.log)

  n = 0
  while True:
    n += 1
    t0 = time.time()
    result = _probe(a.probe_timeout, probe_cmd=probe_cmd)
    record = {"ts": _iso(t0), "event": "probe", **result}
    _append(log_path, record)
    print(json.dumps(record), flush=True)
    up = result.get("tunnel") == "ok"
    if up:
      if a.on_recovery == "revalidate":
        t1 = time.time()
        try:
          proc = subprocess.run(
              [sys.executable, "scripts/revalidate_tpu.py"],
              capture_output=True, text=True, cwd=ROOT,
              timeout=a.revalidate_timeout)
          summary = {"rc": proc.returncode,
                     "tail": proc.stdout.strip()[-400:]}
        except subprocess.TimeoutExpired:
          summary = {"rc": None,
                     "tail": f"timeout after {a.revalidate_timeout}s"}
        rec = {"ts": _iso(t1), "event": "revalidate", **summary}
        _append(log_path, rec)
        print(json.dumps(rec), flush=True)
      return 0
    if a.once or (a.max_probes and n >= a.max_probes):
      return 1
    time.sleep(a.interval)


if __name__ == "__main__":
  raise SystemExit(main())
