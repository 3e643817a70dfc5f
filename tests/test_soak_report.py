"""soak_report.py turns a metrics.jsonl into the SOAK.md evidence table;
check its parsing/aggregation on a synthetic trajectory (no jax)."""

import json
import subprocess
import sys
import os


def test_soak_report_summarizes(tmp_path):
  path = tmp_path / "metrics.jsonl"
  with open(path, "w") as f:
    for e in range(20):
      f.write(json.dumps(dict(
          epoch=e, d_loss=1.0 - e * 0.01, g_loss=0.5, d_grad_norm=3.0,
          g_grad_norm=2.0, wc_cov_cond_max=50.0 + e, d_sigma_max=4.0,
          imgs_per_sec=7000.0, seconds=25.0)) + "\n")
    # score lines (epoch + scores only) must be ignored, not crash:
    f.write(json.dumps(dict(epoch=19, unverified_is_mean=5.0)) + "\n")
  script = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                        "soak_report.py")
  out = subprocess.run(
      [sys.executable, script, str(path), "--steps_per_epoch", "500"],
      capture_output=True, text=True, check=True).stdout
  assert "10,000 outer steps" in out
  assert "**True**" in out            # all finite
  assert "`wc_cov_cond_max` | 50.5" in out  # first-10% mean (e=0,1)
  assert "| 69 |" in out              # max cond
  assert "median 7,000" in out
