#!/usr/bin/env python
"""Per-shape conv probe: where does the conv bucket's MXU headroom go?

BASELINE.md's r3 attribution shows the fused G+D step is conv-bound
(~72% of time) with the convs themselves running at ~35-40% MXU
efficiency — inferred indirectly from MFU + FLOP shares. This probe
measures it DIRECTLY, per conv shape in the headline step, on the real
chip, and tests whether an alternative formulation beats XLA's conv
lowering:

  conv     lax.conv_general_dilated, NHWC, bf16 (what nn.Conv runs)
  im2col   static 3x3 patch gather (pad + 9 shifted slices concat) ->
           one (N*H*W, 9C) @ (9C, F) MXU matmul
  dot      a bare (N*H*W, 9C) @ (9C, F) matmul on pre-materialized
           operands — the pure-MXU ceiling for the same FLOPs

Timing: iterations are chained INSIDE one jitted fori_loop with a
scalar data dependence between them (the ~25 ms tunnel RPC would swamp
sub-ms ops), the trip count is a DYNAMIC argument (one compile per
variant, not per trip count), sized so the loop body dominates the RPC
jitter (>=0.3 s), and each timing is the min of 3 fenced runs (host
scalar fetch — block_until_ready is a no-op on the axon platform,
CLAUDE.md).

Prints one JSON line per (shape, variant, direction) with ms/op and
achieved TFLOP/s vs the 197 TFLOP/s v5e bf16 peak.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

PEAK_BF16 = 197e12

# (name, N, H, W, Cin, Cout, kernel, stride) — every distinct conv shape
# in the CIFAR-10 headline step (G filters 256, D filters 128; G batch =
# 64 real * generator_batch_multiple 2 = 128 on the G step, 64 inside D
# steps; D sees real 64 + fake 64 concatenated).
SHAPES = [
    ("g_b8_256", 128, 8, 8, 256, 256, 3, 1),
    ("g_b16_256", 128, 16, 16, 256, 256, 3, 1),
    ("g_b32_256", 128, 32, 32, 256, 256, 3, 1),
    ("g_last_256to3", 128, 32, 32, 256, 3, 3, 1),
    ("d_in_3to128", 128, 32, 32, 3, 128, 3, 1),
    ("d_b32_128", 128, 32, 32, 128, 128, 3, 1),
    ("d_b16_128", 128, 16, 16, 128, 128, 3, 1),
    ("d_b8_128", 128, 8, 8, 128, 128, 3, 1),
]


def conv_fn(x, w, stride):
  return lax.conv_general_dilated(
      x, w, (stride, stride), "SAME",
      dimension_numbers=("NHWC", "HWIO", "NHWC"))


def im2col_patches(x, k):
  """Static kxk patch tensor (N,H,W,k*k*C) via shifted slices of a pad."""
  n, h, w, c = x.shape
  p = k // 2
  xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
  cols = [xp[:, dy:dy + h, dx:dx + w, :]
          for dy in range(k) for dx in range(k)]
  return jnp.concatenate(cols, axis=-1)


def im2col_fn(x, w, stride):
  del stride  # stride-1 only
  k = w.shape[0]
  n, h, ww, c = x.shape
  f = w.shape[-1]
  patches = im2col_patches(x, k)
  wmat = w.reshape(k * k * c, f)  # HWIO -> rows in (dy, dx, c) order
  y = patches.reshape(n * h * ww, k * k * c) @ wmat
  return y.reshape(n, h, ww, f)


def make_loop(fn, fwd_bwd):
  """One jitted program: dynamic-length fori_loop chaining fn calls with
  a scalar data dependence (no hoisting, no overlap across iterations
  beyond what a real step would get)."""
  # The carry MUST consume every output element (jnp.sum): a single-element
  # carry lets XLA slice the loop body down to one dot-product per
  # iteration (measured: a "4000-matmul" loop ran at an impossible
  # 850+ TFLOP/s before this fix).
  if fwd_bwd:
    def one(x, w):
      def loss(x_, w_):
        return jnp.sum(fn(x_, w_).astype(jnp.float32))
      gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
      return (jnp.sum(gx.astype(jnp.float32)) +
              jnp.sum(gw.astype(jnp.float32)))
  else:
    def one(x, w):
      return jnp.sum(fn(x, w).astype(jnp.float32))

  @jax.jit
  def loop(x, w, n):
    def body(i, acc):
      xi = x + (acc * jnp.asarray(1e-12, jnp.float32)).astype(x.dtype)
      return one(xi, w)
    return lax.fori_loop(0, n, body, jnp.asarray(0, jnp.float32))

  return loop


def timed(fn, args, fwd_bwd, flops_est):
  x, w = args
  loop = make_loop(fn, fwd_bwd)
  float(loop(x, w, 2))  # compile + warm
  # Size the trip count so the body dominates RPC jitter, assuming a
  # conservative 30 TFLOP/s; clamp to keep worst cases bounded. Per-op
  # time = slope between two trip counts (cancels constant overhead).
  est_s = (3.0 if fwd_bwd else 1.0) * flops_est / 30e12
  big = int(min(max(0.3 / max(est_s, 1e-6), 40), 20000))
  small = big // 4
  runs, bases = [], []
  for _ in range(3):
    t0 = time.perf_counter()
    float(loop(x, w, big))
    runs.append(time.perf_counter() - t0)
  for _ in range(3):
    t0 = time.perf_counter()
    float(loop(x, w, small))
    bases.append(time.perf_counter() - t0)
  return (min(runs) - min(bases)) / (big - small)


def main():
  dtype = jnp.bfloat16
  only = [a for a in sys.argv[1:] if not a.startswith("-")]
  for (name, n, h, w, cin, cout, k, stride) in SHAPES:
    if only and name not in only:
      continue
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, h, w, cin), jnp.float32).astype(dtype)
    kern = (jax.random.normal(key, (k, k, cin, cout), jnp.float32)
            * 0.05).astype(dtype)
    flops = 2.0 * n * h * w * k * k * cin * cout / (stride * stride)
    m, kk = n * h * w, k * k * cin
    a = jax.random.normal(key, (m, kk), jnp.float32).astype(dtype)
    b = jax.random.normal(key, (kk, cout), jnp.float32).astype(dtype)

    for vname, fn, args in (
        ("conv", lambda x_, w_, s=stride: conv_fn(x_, w_, s), (x, kern)),
        ("im2col",
         (lambda x_, w_: im2col_fn(x_, w_, 1)) if stride == 1 else None,
         (x, kern)),
        ("dot", lambda a_, b_: a_ @ b_, (a, b)),
    ):
      if fn is None:
        continue
      # fwd_bwd FLOP multiplier is 2.0, NOT 3.0: the probe's loss is
      # sum(fn(x, w)) — linear in the output — so XLA dead-codes the
      # forward pass entirely and the program is exactly (input-grad
      # conv + filter-grad conv) = 2x the forward FLOPs. (The first run
      # of this probe used 3.0 and printed impossible >100% backward
      # efficiencies.)
      for direction, fb, mult in (("fwd", False, 1.0),
                                  ("fwd_bwd", True, 2.0)):
        if vname == "dot" and fb:
          continue  # the ceiling only needs the fwd rate
        sec = timed(fn, args, fb, flops)
        tfs = mult * flops / sec / 1e12
        print(json.dumps({
            "shape": name, "variant": vname, "dir": direction,
            "ms": round(sec * 1e3, 4),
            "tflops": round(tfs, 1),
            "mxu_eff": round(100 * tfs / (PEAK_BF16 / 1e12), 1),
        }), flush=True)


if __name__ == "__main__":
  main()
