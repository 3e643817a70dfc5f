"""bench.py driver-contract tests: one parseable JSON line, always.

The retry wrapper must print a JSON line even when every attempt fails
(the end-r3 relay outage wedged all attempts for hours; a stderr-only
failure would hand the driver nothing to parse). Inner commands are
injected so no test touches the TPU tunnel.
"""

import importlib.util
import json
import sys


def _load_bench():
  spec = importlib.util.spec_from_file_location("bench", "bench.py")
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  return mod


def test_failure_still_prints_one_json_line(capfd):
  bench = _load_bench()
  # Inner prints no JSON => the no-JSON failure path, no tunnel access.
  rc = bench._run_with_retries(
      attempts=1, timeout_s=30, cmd=[sys.executable, "-c", "print('hi')"])
  assert rc == 1
  out = capfd.readouterr().out.strip().splitlines()
  assert len(out) == 1
  rec = json.loads(out[0])
  assert rec["value"] == 0.0 and rec["vs_baseline"] == 0.0
  assert "error" in rec and rec["unit"] == "imgs/sec/chip"


def test_wedged_attempt_is_killed_and_reported(capfd):
  bench = _load_bench()
  # Inner sleeps past the watchdog => the wedge path (kill + report).
  rc = bench._run_with_retries(
      attempts=2, timeout_s=2, sleep_s=0,
      cmd=[sys.executable, "-c", "import time; time.sleep(60)"])
  assert rc == 1
  cap = capfd.readouterr()
  assert "wedged" in cap.err
  rec = json.loads(cap.out.strip().splitlines()[-1])
  assert rec["value"] == 0.0 and "wedged" in rec["error"]


def test_success_passes_inner_json_through(capfd):
  bench = _load_bench()
  inner = ("import json; print('noise'); "
           "print(json.dumps({'metric': 'm', 'value': 1.5, "
           "'unit': 'u', 'vs_baseline': 2.0}))")
  rc = bench._run_with_retries(
      attempts=1, timeout_s=30, cmd=[sys.executable, "-c", inner])
  assert rc == 0
  rec = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
  assert rec["value"] == 1.5
