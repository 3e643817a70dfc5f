#!/usr/bin/env python
"""Component-level timing of the fused outer step on the real chip.

Motivated by scripts/conv_probe.py's r3 finding: XLA's convs already run
at 87-102% MXU efficiency at every dominant shape in the headline step
(im2col is strictly worse, BASELINE.md), so the step's measured ~34 ms
CANNOT be conv-math-bound — conv FLOPs at the measured per-shape rates
account for only ~10-12 ms. This script times the real components
(module applies, grads, full outer variants) to locate the rest.

Methodology: sub-ms components are chained inside one jitted fori_loop
with a full-output data dependence (see conv_probe.py's slicing trap);
full outer steps are timed by dispatch loop exactly like bench.py.
Timing fence = host scalar fetch (block_until_ready is a no-op on the
axon platform).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from wcgan_tpu.models.discriminator import Discriminator, DiscriminatorConfig
from wcgan_tpu.models.generator import Generator, GeneratorConfig
from wcgan_tpu.ops import whiten as whiten_ops
from wcgan_tpu.train import schedules
from wcgan_tpu.train.state import create_state
from wcgan_tpu.train.step import GANConfig, make_jit_step


def build(norm="d", ns_iters=15, dtype="bfloat16", spectral=True):
  gcfg = GeneratorConfig(
      z_dim=128, resolution=32, base_resolution=4,
      filters=(256, 256, 256), block_norm=norm, last_norm=norm,
      ns_iters=ns_iters, dtype=dtype, block_coloring="uconv",
      last_coloring="uconv")
  dcfg = DiscriminatorConfig(
      resolution=32, filters=(128, 128, 128, 128),
      downsample=(True, True, False, False), ns_iters=ns_iters,
      spectral=spectral, dtype=dtype)
  return Generator(cfg=gcfg), Discriminator(cfg=dcfg)


def _tree_sum(tree):
  leaves = jax.tree_util.tree_leaves(tree)
  return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def loop_time(one, n_big):
  """one: f32 scalar -> f32 scalar, full workload inside."""
  @jax.jit
  def loop(s0, n):
    return lax.fori_loop(0, n, lambda i, s: one(s), s0)

  s0 = jnp.asarray(0.0, jnp.float32)
  float(loop(s0, 2))
  small = max(n_big // 4, 1)
  runs, bases = [], []
  for _ in range(3):
    t0 = time.perf_counter()
    float(loop(s0, n_big))
    runs.append(time.perf_counter() - t0)
  for _ in range(3):
    t0 = time.perf_counter()
    float(loop(s0, small))
    bases.append(time.perf_counter() - t0)
  return (min(runs) - min(bases)) / (n_big - small)


def g_forward(g, batch, train=True, n=100):
  z0 = jax.random.normal(jax.random.PRNGKey(0), (batch, 128), jnp.float32)
  variables = g.init(jax.random.PRNGKey(1), z0[:2], train=True)
  params = variables["params"]
  g_state = {k: v for k, v in variables.items() if k != "params"}

  def one(s):
    z = z0 + (s * 1e-12).astype(z0.dtype)
    if train and g_state:
      fake, _ = g.apply({"params": params, **g_state}, z, train=True,
                        mutable=list(g_state.keys()))
    else:
      fake = g.apply({"params": params, **g_state}, z, train=train)
    return jnp.sum(fake.astype(jnp.float32))

  return loop_time(one, n)


def g_forward_backward(g, batch, n=60):
  z0 = jax.random.normal(jax.random.PRNGKey(0), (batch, 128), jnp.float32)
  variables = g.init(jax.random.PRNGKey(1), z0[:2], train=True)
  params = variables["params"]
  g_state = {k: v for k, v in variables.items() if k != "params"}

  def one(s):
    z = z0 + (s * 1e-12).astype(z0.dtype)

    def loss_fn(p):
      fake, _ = g.apply({"params": p, **g_state}, z, train=True,
                        mutable=list(g_state.keys()))
      return jnp.mean(jnp.square(fake.astype(jnp.float32)))

    grads = jax.grad(loss_fn)(params)
    return _tree_sum(grads)

  return loop_time(one, n)


def d_forward(d, batch, n=150):
  x0 = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3),
                         jnp.float32)
  variables = d.init(jax.random.PRNGKey(1), x0[:2], train=True)
  params = variables["params"]
  d_state = {k: v for k, v in variables.items() if k != "params"}

  def one(s):
    x = x0 + (s * 1e-12).astype(x0.dtype)
    if d_state:
      (scores, _), _ = d.apply({"params": params, **d_state}, x,
                               train=True, update_sn=True,
                               mutable=list(d_state.keys()))
    else:
      scores, _ = d.apply({"params": params}, x, train=True,
                          update_sn=True)
    return jnp.sum(scores.astype(jnp.float32))

  return loop_time(one, n)


def d_forward_backward(d, batch, n=80):
  x0 = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3),
                         jnp.float32)
  variables = d.init(jax.random.PRNGKey(1), x0[:2], train=True)
  params = variables["params"]
  d_state = {k: v for k, v in variables.items() if k != "params"}

  def one(s):
    x = x0 + (s * 1e-12).astype(x0.dtype)

    def loss_fn(p):
      if d_state:
        (scores, _), _ = d.apply({"params": p, **d_state}, x, train=True,
                                 update_sn=True,
                                 mutable=list(d_state.keys()))
      else:
        scores, _ = d.apply({"params": p}, x, train=True, update_sn=True)
      return jnp.mean(scores.astype(jnp.float32))

    grads = jax.grad(loss_fn)(params)
    return _tree_sum(grads)

  return loop_time(one, n)


def outer(norm, ns_iters, ratio, steps=20, batch=64, batched_fake=False):
  g, d = build(norm=norm, ns_iters=ns_iters)
  cfg = GANConfig(training_ratio=ratio, generator_batch_multiple=2,
                  z_dim=128, random_flip=True,
                  batched_fake_gen=batched_fake)
  g_tx, d_tx = schedules.adam(2e-4), schedules.adam(2e-4)
  state = create_state(g, d, g_tx, d_tx, jax.random.PRNGKey(0),
                       batch_size=batch, z_dim=128,
                       image_shape=(32, 32, 3))
  step_fn = make_jit_step(g, d, g_tx, d_tx, cfg, donate=True)
  real = jax.random.randint(jax.random.PRNGKey(1),
                            (ratio, batch, 32, 32, 3), 0, 256
                            ).astype(jnp.uint8)
  labels = jnp.zeros((ratio, batch), jnp.int32)
  state, metrics = step_fn(state, real, labels)
  float(metrics["d_loss"])
  t0 = time.perf_counter()
  for _ in range(steps):
    state, metrics = step_fn(state, real, labels)
  float(metrics["d_loss"])
  return (time.perf_counter() - t0) / steps


def emit(name, sec):
  print(json.dumps({"component": name, "ms": round(sec * 1e3, 3)}),
        flush=True)


def main():
  whiten_ops.set_precision("high")
  only = set(a for a in sys.argv[1:] if not a.startswith("-"))

  def want(tag):
    return not only or tag in only

  if want("outer"):
    for norm, ns, ratio in (("d", 15, 5), ("n", 15, 5), ("d", 15, 1),
                            ("n", 15, 1)):
      emit(f"outer_norm{norm}_ns{ns}_r{ratio}", outer(norm, ns, ratio))

  if want("batched"):
    # --batched_fake_gen swing: interleaved A/B of the headline shape.
    for tag, flag in (("off", False), ("on", True), ("off2", False),
                      ("on2", True)):
      emit(f"outer_normd_r5_batchedfake_{tag}",
           outer("d", 15, 5, batched_fake=flag))

  if want("gfwd"):
    for norm, ns in (("d", 15), ("d", 5), ("n", 15)):
      g, _ = build(norm=norm, ns_iters=ns)
      for batch in (64, 128):
        emit(f"g_fwd_train_norm{norm}_ns{ns}_b{batch}",
             g_forward(g, batch))

  if want("gbwd"):
    for norm, ns in (("d", 15), ("n", 15)):
      g, _ = build(norm=norm, ns_iters=ns)
      emit(f"g_fwdbwd_norm{norm}_ns{ns}_b128", g_forward_backward(g, 128))

  if want("dfwd"):
    for spectral in (True, False):
      _, d = build(spectral=spectral)
      emit(f"d_fwd_train_sn{int(spectral)}_b128", d_forward(d, 128))

  if want("dbwd"):
    for spectral in (True, False):
      _, d = build(spectral=spectral)
      emit(f"d_fwdbwd_sn{int(spectral)}_b128", d_forward_backward(d, 128))


if __name__ == "__main__":
  main()
