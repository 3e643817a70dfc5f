#!/usr/bin/env python
"""Op-by-op FLOPs attribution of the fused G+D outer step (VERDICT r2 #4).

Device-side traces are unavailable through this box's TPU tunnel
(docs/ROADMAP.md #7), so attribution works from the compiled program
itself: parse the optimized HLO, compute FLOPs for every convolution and
dot from its shapes, and bucket them by the source component recorded in
each op's metadata (op_name carries the jax/flax scope path; source_file
the defining module). Buckets:

  conv        — G/D convolutions fwd+bwd (flax conv scopes)
  whiten      — moments + Newton-Schulz chain + W folds (ops/whiten.py,
                models/layers.py fold matmuls)
  coloring    — coloring matmuls outside the fold (ops/coloring.py)
  sn          — spectral-norm power iteration (ops/sn.py)
  dense/embed — D head, G stem, projection embedding
  optimizer   — Adam / optax update math
  other       — everything else (losses, prep, reshapes)

Each op also records its element type; f32 dots/convs on the v5e MXU run
as multi-pass bf16 emulation (HIGHEST = 6 passes, HIGH = 3), so the
table reports an *effective-time weight* flops/eff with eff = 1 (bf16),
1/3 (f32 HIGH), 1/6 (f32 HIGHEST) — an estimate of where step time goes
and of the achievable MFU ceiling, cross-checkable against the measured
ablations in BASELINE.md.

Run serialized with other TPU work:  python scripts/step_attribution.py
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
from collections import defaultdict

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
INSTR_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(\w+)\[([\d,]*)\]")


def _prod(xs):
  out = 1
  for x in xs:
    out *= x
  return out


def _parse_shape(m):
  dtype, dims = m.group(1), m.group(2)
  shape = tuple(int(x) for x in dims.split(",") if x) if dims else ()
  return dtype, shape


def classify(meta: str, kind: str = "") -> str:
  """Bucket an op by its metadata op_name/source_file."""
  m = meta.lower()
  if not m:
    # Kernel-gradient convolutions are emitted without metadata; they
    # are conv backward work.
    return "conv" if kind == "conv" else "other"
  if "whiten" in m or "newton" in m or "_ns_iterate" in m:
    return "whiten"
  if ("_fused_wc" in m or "norm_color" in m or "normcolor" in m
      or "wc_stats" in m):
    return "whiten"
  if "coloring" in m or "color_" in m:
    return "coloring"
  if ("spectral" in m or "sn_ops" in m or "/sn." in m
      or "power_iter" in m):
    return "sn"
  if "adam" in m or "optax" in m or "apply_updates" in m:
    return "optimizer"
  if "conv" in m:
    return "conv"
  if "dense" in m or "embed" in m:
    return "dense/embed"
  return "other"


def attribute(hlo_text: str):
  """Return {bucket: {dtype: flops}} + per-op debug rows."""
  shapes = {}
  for line in hlo_text.splitlines():
    mi = INSTR_RE.match(line)
    if mi:
      name = mi.group(1)
      shape = tuple(int(x) for x in mi.group(3).split(",") if x)
      shapes[name] = (mi.group(2), shape)

  buckets = defaultdict(lambda: defaultdict(float))
  rows = []
  for line in hlo_text.splitlines():
    mi = INSTR_RE.match(line)
    if not mi:
      continue
    out_dtype = mi.group(2)
    out_shape = tuple(int(x) for x in mi.group(3).split(",") if x)
    meta_m = re.search(r'metadata=\{([^}]*)\}', line)
    meta = meta_m.group(1) if meta_m else ""
    flops = 0.0
    kind = ""

    if " convolution(" in line or "= convolution(" in line:
      kind = "conv"
      ops = re.search(r"convolution\(([^)]*)\)", line)
      if not ops:
        continue
      operands = [o.strip().lstrip("%") for o in ops.group(1).split(",")]
      if len(operands) < 2:
        continue
      kname = operands[1]
      if kname not in shapes:
        continue
      _, kshape = shapes[kname]
      dl = re.search(r"dim_labels=(\S+?)(?:,|\s|$)", line)
      cout = None
      if dl:
        parts = dl.group(1).split("->")[0].split("_")
        if len(parts) >= 2 and "o" in parts[1]:
          cout = kshape[parts[1].index("o")]
      if cout is None:
        cout = kshape[-1] if kshape else 1
      flops = 2.0 * _prod(out_shape) * _prod(kshape) / max(cout, 1)
      # Not every window tap hits data, and XLA's cost_analysis only
      # counts the ones that do. Effective taps per spatial dim
      #   = min(ceil(window / lhs_dilate), lhs spatial extent).
      # Three dot/conv lowering forms need this (all measured r5):
      # (a) stride-2 ConvTranspose fwd / strided-conv input grads
      #     (lhs_dilate=2) — the DCGAN cfg1 path parsed 2.07x XLA's
      #     total (0.251 vs 0.121 TFLOP) before;
      # (b) BATCHED dot_general as `convolution-base-dilated` with a
      #     size=B, lhs_dilate=B batch window (dim_labels 0bf_0oi->0bf)
      #     — the conditional fold/apply einsums parsed 128x over
      #     (cfg2: 28.5 parsed vs 4.0 XLA TFLOP, a physically
      #     impossible 733 TFLOP/s at the measured step time);
      # (c) small-contraction dots as pad-heavy rhs_reversal convs:
      #     cfg4's soft-assignment fold nk,koc->noc (k=10) lowers to
      #     window={size=512 pad=511_511 rhs_reversal=1} over a
      #     LENGTH-1 lhs spatial dim — 511 of 512 taps are padding
      #     zeros, a 512x overcount (5.48 parsed TFLOP of whiten-f32
      #     that implied 128.7 model TFLOP/s against a 107 TFLOP/s
      #     mix-adjusted ceiling).
      # Boundary padding on ordinary convs is still charged in full,
      # which is the measured +5-6% parsed-vs-XLA residual on the
      # kernel-grad-heavy configs.
      wsz = re.search(r"window=\{[^}]*size=([\dx]+)", line)
      ld = re.search(r"lhs_dilate=([\dx]+)", line)
      lhs_spatial = {}
      if dl and operands[0] in shapes:
        lhs_labels = dl.group(1).split("->")[0].split("_")[0]
        _, lsh = shapes[operands[0]]
        if len(lsh) == len(lhs_labels):
          for pos, ch in enumerate(lhs_labels):
            if ch.isdigit():
              lhs_spatial[int(ch)] = lsh[pos]
      if wsz:
        sizes = [int(x) for x in wsz.group(1).split("x")]
        dils = ([int(x) for x in ld.group(1).split("x")]
                if ld else [1] * len(sizes))
        for i, w in enumerate(sizes):
          d = dils[i] if i < len(dils) else 1
          taps = (w + d - 1) // d
          if i in lhs_spatial:
            taps = min(taps, lhs_spatial[i])
          flops = flops / w * taps
    elif " dot(" in line:
      kind = "dot"
      ops = re.search(r"dot\(([^)]*)\)", line)
      lc = re.search(r"lhs_contracting_dims=\{([\d,]*)\}", line)
      if not ops or not lc:
        continue
      operands = [o.strip().lstrip("%") for o in ops.group(1).split(",")]
      lname = operands[0]
      if lname not in shapes:
        continue
      _, lshape = shapes[lname]
      cdims = [int(x) for x in lc.group(1).split(",") if x]
      k = _prod(lshape[i] for i in cdims) if cdims else 1
      flops = 2.0 * _prod(out_shape) * k
    else:
      continue

    bucket = classify(meta, kind)
    buckets[bucket][out_dtype] += flops
    rows.append((bucket, out_dtype, flops, out_shape,
                 meta[:140]))
  return buckets, rows


# Effective MXU throughput weight per element type (v5e: f32 dots run as
# bf16 multi-pass emulation; whitening-path math is HIGH = 3 passes since
# the r3 default promotion — ops/whiten.py).
EFF = {"bf16": 1.0, "f32": 1.0 / 3.0}


def main() -> int:
  ap = argparse.ArgumentParser()
  ap.add_argument("--config", default="headline",
                  help="headline (bench.py shape) or cfg1..cfg5 "
                       "(BASELINE per-chip config shapes; "
                       "tools/bench_shapes.py — VERDICT r4 #1)")
  ap.add_argument("--f32", action="store_true")
  ap.add_argument("--dump_ops", type=int, default=0,
                  help="print the N largest individual ops")
  ap.add_argument("--platform", default="auto")
  ap.add_argument("--save_hlo", default="",
                  help="write the optimized HLO text here so parser "
                       "fixes can iterate offline (no chip re-runs)")
  ap.add_argument("--ns_iters", type=int, default=15)
  ap.add_argument("--batch", type=int, default=64)
  a = ap.parse_args()

  import jax
  if a.platform != "auto":
    jax.config.update("jax_platforms",
                      {"tpu": "axon"}.get(a.platform, a.platform))

  sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
  from wcgan_tpu.tools.bench_shapes import build_bench

  dtype = "float32" if a.f32 else "bfloat16"
  # unroll_d_scan: the production step runs the K D updates as a
  # lax.scan, whose body appears ONCE in the HLO text (and once in XLA's
  # own cost_analysis — measured r3: 1.990 TFLOP at both ratio=1 and
  # ratio=5). Attribution must see all K bodies, so it parses the
  # unrolled variant of the same math.
  step_fn, state, (real, labels), spec = build_bench(
      a.config, batch=a.batch, dtype=dtype, ns_iters=a.ns_iters,
      donate=False, unroll_d_scan=True)
  batch, ratio = a.batch, spec["ratio"]

  compiled = step_fn.lower(state, real, labels).compile()
  cost = compiled.cost_analysis()
  if isinstance(cost, list):
    cost = cost[0]
  hlo = compiled.as_text()
  if a.save_hlo:
    with open(a.save_hlo, "w") as f:
      f.write(hlo)
  buckets, rows = attribute(hlo)

  total = sum(f for dd in buckets.values() for f in dd.values())
  wtotal = sum(f / EFF.get(dt, 1.0)
               for dd in buckets.values() for dt, f in dd.items())
  print(f"# outer-step attribution ({a.config}: res {spec['res']}, "
        f"ncls {spec['ncls']}, {dtype}, batch {batch}, ratio "
        f"{ratio}, ns_iters {a.ns_iters})")
  print(f"XLA cost_analysis total: {float(cost['flops'])/1e12:.3f} "
        f"TFLOP | parsed conv+dot total: {total/1e12:.3f} TFLOP")
  print("| bucket | dtype | GFLOP | % of parsed | eff-weighted % |")
  print("|---|---|---|---|---|")
  for bucket in sorted(buckets,
                       key=lambda b: -sum(buckets[b].values())):
    for dt, f in sorted(buckets[bucket].items(), key=lambda kv: -kv[1]):
      w = f / EFF.get(dt, 1.0)
      print(f"| {bucket} | {dt} | {f/1e9:,.1f} | {100*f/total:.1f}% "
            f"| {100*w/wtotal:.1f}% |")
  if a.dump_ops:
    for r in sorted(rows, key=lambda r: -r[2])[:a.dump_ops]:
      print(json.dumps(dict(bucket=r[0], dtype=r[1],
                            gflop=round(r[2] / 1e9, 2),
                            out_shape=r[3], meta=r[4])))
  return 0


if __name__ == "__main__":
  raise SystemExit(main())
