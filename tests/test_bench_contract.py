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


def test_wedged_probe_fast_fails_with_json(capfd):
  """VERDICT r3 #1a: a relay outage must produce the honest JSON line
  in probe-budget time, not after the full 3x900s retry ladder (which
  left BENCH_r03.json contentless when the driver killed it at 900s)."""
  import time
  bench = _load_bench()
  t0 = time.perf_counter()
  rc = bench._run_with_retries(
      attempts=3, timeout_s=900, sleep_s=330,
      # inner would sleep forever — it must never be launched
      cmd=[sys.executable, "-c", "import time; time.sleep(600)"],
      # probe simulating the claim-park wedge: exits non-zero
      probe_cmd=[sys.executable, "-c",
                 "import json,sys; print(json.dumps({'tunnel':'wedged',"
                 "'seconds':180.0})); sys.exit(1)"],
      probe_timeout_s=30)
  elapsed = time.perf_counter() - t0
  assert rc == 1
  assert elapsed < 30, f"fast-fail took {elapsed:.0f}s — ladder ran"
  cap = capfd.readouterr()
  out = cap.out.strip().splitlines()
  assert len(out) == 1
  rec = json.loads(out[0])
  assert rec["value"] == 0.0 and rec["vs_baseline"] == 0.0
  assert "probe" in rec["error"] and "relay outage" in rec["context"]


def test_probe_ok_plus_watchdog_kill_is_reported_ambiguous(capfd):
  """ADVICE r4: probe-ok + watchdog-kill must NOT claim clean outage
  evidence — the probe just passed, so the wedge reading is ambiguous
  (relay wedged after the probe, or the 3-measurement inner workload
  outran the watchdog)."""
  bench = _load_bench()
  rc = bench._run_with_retries(
      attempts=1, timeout_s=2, sleep_s=0,
      cmd=[sys.executable, "-c", "import time; time.sleep(60)"],
      probe_cmd=[sys.executable, "-c", "print('{\"tunnel\": \"ok\"}')"],
      probe_timeout_s=30)
  assert rc == 1
  rec = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
  assert rec["value"] == 0.0
  assert "ambiguous" in rec["context"]
  assert "relay outage (the hours-long" not in rec["context"]


def test_ok_probe_proceeds_to_measurement(capfd):
  bench = _load_bench()
  inner = ("import json; print(json.dumps({'metric': 'm', 'value': 3.0, "
           "'unit': 'u', 'vs_baseline': 1.0}))")
  rc = bench._run_with_retries(
      attempts=1, timeout_s=30,
      cmd=[sys.executable, "-c", inner],
      probe_cmd=[sys.executable, "-c", "print('{\"tunnel\": \"ok\"}')"],
      probe_timeout_s=30)
  assert rc == 0
  rec = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
  assert rec["value"] == 3.0


def test_crashing_inner_with_incidental_json_is_a_failure(capfd):
  """ADVICE r3: an inner run that prints a JSON-ish log line and then
  crashes non-zero must NOT be reported as a successful measurement."""
  bench = _load_bench()
  inner = ("import sys; print('{\"event\": \"library log line\"}'); "
           "sys.exit(3)")
  rc = bench._run_with_retries(
      attempts=1, timeout_s=30, cmd=[sys.executable, "-c", inner])
  assert rc == 1
  rec = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
  assert rec["value"] == 0.0
  assert "code fault" in rec["context"]  # ran-and-failed, not outage


def test_clean_exit_without_contract_fields_is_a_failure(capfd):
  """A clean exit whose JSON lacks the driver contract fields is still
  a failure — the contract requires metric/value/unit/vs_baseline."""
  bench = _load_bench()
  inner = "print('{\"metric\": \"m\"}')"
  rc = bench._run_with_retries(
      attempts=1, timeout_s=30, cmd=[sys.executable, "-c", inner])
  assert rc == 1
  rec = json.loads(capfd.readouterr().out.strip().splitlines()[-1])
  assert rec["value"] == 0.0


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
