"""Driver-contract tests for __graft_entry__ (VERDICT r1 item 1).

The driver runs ``dryrun_multichip(8)`` in a fresh process with the
session platform pinned to the single-chip TPU tunnel; the function must
self-provision a virtual 8-device CPU mesh. Under pytest the conftest has
already provisioned that mesh, so the in-process path is exercised here;
the subprocess fallback is exercised by running the recorded driver
command verbatim.
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, _REPO)


def test_dryrun_multichip_in_process():
  import __graft_entry__
  __graft_entry__.dryrun_multichip(8)  # raises/asserts on failure


@pytest.mark.slow
def test_dryrun_multichip_driver_command():
  """The exact driver invocation, in the session env (axon pinned)."""
  env = dict(os.environ)
  env.pop("WCGAN_TEST_TPU", None)
  proc = subprocess.run(
      [sys.executable, "-c",
       "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
      cwd=_REPO, env=env, capture_output=True, text=True, timeout=600)
  assert proc.returncode == 0, proc.stderr[-2000:]
  assert "OK" in proc.stdout
