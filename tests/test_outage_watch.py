"""outage_watch contract tests: one JSONL line per probe, correct
up/down exit semantics, bounded even when the probe misbehaves.

The real tunnel probe is replaced via --probe-cmd so no test touches
the TPU tunnel (same injection pattern as tests/test_bench_contract.py).
"""

import json
import os
import subprocess
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
WATCH = os.path.join(ROOT, "scripts", "outage_watch.py")

_OK = ("import json; print(json.dumps({'tunnel': 'ok', "
       "'platform': 'tpu', 'seconds': 1.0}))")
_WEDGED = ("import json, sys; print(json.dumps({'tunnel': 'wedged', "
           "'seconds': 180.0})); sys.exit(1)")


def test_ok_probe_logs_and_exits_zero(tmp_path):
  # --probe-cmd is whitespace-split: use a helper script file instead of
  # `-c <code>` (inline code contains spaces).
  helper = tmp_path / "ok_probe.py"
  helper.write_text(_OK)
  log = tmp_path / "outage.jsonl"
  proc = subprocess.run(
      [sys.executable, WATCH, "--once", "--log", str(log),
       "--probe-cmd", f"{sys.executable} {helper}"],
      capture_output=True, text=True, cwd=ROOT, timeout=120)
  assert proc.returncode == 0, proc.stderr
  lines = log.read_text().strip().splitlines()
  assert len(lines) == 1
  rec = json.loads(lines[0])
  assert rec["event"] == "probe" and rec["tunnel"] == "ok"
  assert rec["ts"].endswith("Z")


def test_wedged_probe_logs_and_exits_nonzero(tmp_path):
  helper = tmp_path / "wedged_probe.py"
  helper.write_text(_WEDGED)
  log = tmp_path / "outage.jsonl"
  proc = subprocess.run(
      [sys.executable, WATCH, "--once", "--log", str(log),
       "--probe-cmd", f"{sys.executable} {helper}"],
      capture_output=True, text=True, cwd=ROOT, timeout=120)
  assert proc.returncode == 1
  rec = json.loads(log.read_text().strip().splitlines()[0])
  assert rec["tunnel"] == "wedged"


def test_max_probes_bounds_the_watch(tmp_path):
  helper = tmp_path / "wedged_probe.py"
  helper.write_text(_WEDGED)
  log = tmp_path / "outage.jsonl"
  proc = subprocess.run(
      [sys.executable, WATCH, "--max-probes", "2", "--interval", "0",
       "--log", str(log),
       "--probe-cmd", f"{sys.executable} {helper}"],
      capture_output=True, text=True, cwd=ROOT, timeout=120)
  assert proc.returncode == 1
  assert len(log.read_text().strip().splitlines()) == 2
