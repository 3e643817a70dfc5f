#!/usr/bin/env python
"""Measured TF/Keras-style baseline proxy for ``vs_baseline`` (VERDICT r1 #4).

The reference never published throughput and no V100 exists here, so the
denominator in bench.py was an estimate. This script replaces it with a
measurement: the reference's training step re-implemented with the SAME
math and the SAME execution model it used (graph-mode TF, one session
round-trip per update, host numpy feed per call — SURVEY.md §3.3), run on
this machine's CPU; and, for a same-hardware ratio, our fused JAX outer
step on the SAME CPU.

Reference-parity details reproduced (all [U], SURVEY.md §2a/§3.3):
- WC layer: batch mean/cov over N*H*W rows, Cholesky inverse square root
  (tf.linalg.cholesky + triangular_solve), EMA moving stats, followed by
  an unconditional 1x1 coloring (``conditional_layers.py::
  DecorelationNormalization`` + ``ConditionalConv11`` [U]).
- SN conv/dense: one power iteration on the reshaped kernel per forward,
  persistent u, updated on D steps (``gan/spectral_normalized_layers.py``
  [U]).
- Architecture/optim: the bench.py headline config — WC ResNet G
  (256x3 up-blocks), SN ResNet D (128x4, optimized first block), hinge
  loss, Adam(2e-4, 0.0, 0.9), batch 64, 5 D-updates + 1 G-update (G batch
  2x64) per outer step (``gan/gan.py``/``gan/train.py`` [U]).
- Execution model: one ``tf.function`` call per update with fresh numpy
  fed from host each call == one ``sess.run`` per ``train_on_batch``.

Usage (run the two impls in separate processes; single CPU core):
    python scripts/baseline_proxy.py --impl tf   [--outer_steps 3]
    python scripts/baseline_proxy.py --impl jax  [--outer_steps 3]

Each prints one JSON line {"impl", "imgs_per_sec", ...}. The ratio
jax/tf on identical hardware is the framework-design speedup; BASELINE.md
records both plus the documented CPU->V100 scaling used by bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

BATCH = 64
G_MULT = 2      # --generator_batch_multiple
RATIO = 5       # --training_ratio
Z_DIM = 128
RES = 32
G_FILTERS = (256, 256, 256)
D_FILTERS = (128, 128, 128, 128)
EPS = 1e-5
MOMENTUM = 0.99


# ---------------------------------------------------------------- TF side
def run_tf(outer_steps: int, fused: bool = False) -> dict:
  """``fused=False``: the reference's execution model — one tf.function
  call per update, fresh host numpy feed per call (== one sess.run per
  train_on_batch). ``fused=True`` (VERDICT r4 #6): the OTHER bracket —
  the whole outer step (RATIO D updates + 1 G update) in ONE tf.function
  with in-graph RNG, i.e. zero host feeds and one dispatch per outer
  step — an upper bound on what any TF/Keras implementation of the
  reference could reach on this hardware (graph-mode executor, no XLA:
  TF 1.x-era parity). The two points bracket the V100 denominator, so
  BASELINE.md reports vs_baseline as a range."""
  import tensorflow as tf
  tf.config.set_visible_devices([], "GPU")

  def l2(v):
    return v / (tf.norm(v) + 1e-12)

  class SNKernel:
    """Spectrally-normalized kernel: sigma via one power iteration on the
    reshaped kernel; u persists and updates on D-step forwards."""

    def __init__(self, shape, name):
      init = tf.keras.initializers.GlorotUniform()
      self.w = tf.Variable(init(shape), name=name + "_w")
      self.u = tf.Variable(tf.random.normal([int(shape[-1])]),
                           trainable=False, name=name + "_u")

    def normalized(self, update_u):
      w_mat = tf.reshape(self.w, [-1, self.w.shape[-1]])
      v = l2(tf.linalg.matvec(w_mat, self.u))
      u_new = l2(tf.linalg.matvec(w_mat, v, transpose_a=True))
      sigma = tf.tensordot(v, tf.linalg.matvec(w_mat, u_new), 1)
      if update_u:
        self.u.assign(u_new)
      return self.w / sigma

  class WCColor:
    """DecorelationNormalization (Cholesky) + uncond 1x1 coloring."""

    def __init__(self, c, name):
      self.mov_mean = tf.Variable(tf.zeros([c]), trainable=False,
                                  name=name + "_mmean")
      self.mov_cov = tf.Variable(tf.eye(c), trainable=False,
                                 name=name + "_mcov")
      self.gamma = tf.Variable(tf.eye(c), name=name + "_gamma")
      self.beta = tf.Variable(tf.zeros([c]), name=name + "_beta")
      self.c = c

    def __call__(self, x, training=True):
      c = self.c
      rows = tf.reshape(x, [-1, c])
      mean = tf.reduce_mean(rows, axis=0)
      xc = rows - mean
      cov = tf.matmul(xc, xc, transpose_a=True) / tf.cast(
          tf.shape(rows)[0], tf.float32)
      if training:
        self.mov_mean.assign(MOMENTUM * self.mov_mean +
                             (1 - MOMENTUM) * mean)
        self.mov_cov.assign(MOMENTUM * self.mov_cov + (1 - MOMENTUM) * cov)
      chol = tf.linalg.cholesky(cov + EPS * tf.eye(c))
      w = tf.linalg.triangular_solve(chol, tf.eye(c), lower=True)
      white = tf.matmul(xc, w, transpose_b=True)
      out = tf.matmul(white, self.gamma) + self.beta
      return tf.reshape(out, tf.shape(x))

  def upsample(x):
    s = tf.shape(x)
    x = tf.reshape(x, [s[0], s[1], 1, s[2], 1, x.shape[-1]])
    x = tf.tile(x, [1, 1, 2, 1, 2, 1])
    return tf.reshape(x, [s[0], s[1] * 2, s[2] * 2, x.shape[-1]])

  def downsample(x):
    return tf.nn.avg_pool2d(x, 2, 2, "VALID")

  class Generator:
    def __init__(self):
      init = tf.keras.initializers.GlorotUniform()
      base = RES // (2 ** len(G_FILTERS))
      self.base = base
      self.dense_w = tf.Variable(
          init([Z_DIM, base * base * G_FILTERS[0]]), name="g_dense_w")
      self.dense_b = tf.Variable(tf.zeros([base * base * G_FILTERS[0]]),
                                 name="g_dense_b")
      self.blocks = []
      cin = G_FILTERS[0]
      for i, f in enumerate(G_FILTERS):
        blk = dict(
            nc1=WCColor(cin, f"g{i}_nc1"),
            conv1=tf.Variable(init([3, 3, cin, f]), name=f"g{i}_c1"),
            nc2=WCColor(f, f"g{i}_nc2"),
            conv2=tf.Variable(init([3, 3, f, f]), name=f"g{i}_c2"),
            sc=(tf.Variable(init([1, 1, cin, f]), name=f"g{i}_sc")
                if cin != f else None))
        self.blocks.append(blk)
        cin = f
      self.final_nc = WCColor(cin, "g_final_nc")
      self.out_conv = tf.Variable(init([3, 3, cin, 3]), name="g_out")

    def trainable(self):
      out = [self.dense_w, self.dense_b, self.out_conv]
      ncs = [self.final_nc] + [b[k] for b in self.blocks
                               for k in ("nc1", "nc2")]
      out += [v for nc in ncs for v in (nc.gamma, nc.beta)]
      for b in self.blocks:
        out += [b["conv1"], b["conv2"]]
        if b["sc"] is not None:
          out.append(b["sc"])
      return out

    def __call__(self, z, training=True):
      h = tf.matmul(z, self.dense_w) + self.dense_b
      h = tf.reshape(h, [-1, self.base, self.base, G_FILTERS[0]])
      for b in self.blocks:
        x = b["nc1"](h, training)
        x = tf.nn.relu(x)
        x = upsample(x)
        x = tf.nn.conv2d(x, b["conv1"], 1, "SAME")
        x = b["nc2"](x, training)
        x = tf.nn.relu(x)
        x = tf.nn.conv2d(x, b["conv2"], 1, "SAME")
        sc = upsample(h)
        if b["sc"] is not None:
          sc = tf.nn.conv2d(sc, b["sc"], 1, "SAME")
        h = x + sc
      h = self.final_nc(h, training)
      h = tf.nn.relu(h)
      return tf.nn.tanh(tf.nn.conv2d(h, self.out_conv, 1, "SAME"))

  class Discriminator:
    def __init__(self):
      self.kernels = []

      def k(shape, name):
        sk = SNKernel(shape, name)
        self.kernels.append(sk)
        return sk

      f0 = D_FILTERS[0]
      self.opt = dict(c1=k([3, 3, 3, f0], "d0_c1"),
                      c2=k([3, 3, f0, f0], "d0_c2"),
                      sc=k([1, 1, 3, f0], "d0_sc"))
      self.blocks = []
      cin = f0
      for i, f in enumerate(D_FILTERS[1:], 1):
        down = i == 1
        self.blocks.append(dict(
            c1=k([3, 3, cin, f], f"d{i}_c1"),
            c2=k([3, 3, f, f], f"d{i}_c2"),
            sc=(k([1, 1, cin, f], f"d{i}_sc")
                if (cin != f or down) else None),
            down=down))
        cin = f
      self.dense = k([cin, 1], "d_dense")

    def trainable(self):
      return [sk.w for sk in self.kernels]

    def __call__(self, x, update_u=False):
      o = self.opt
      h = tf.nn.conv2d(x, o["c1"].normalized(update_u), 1, "SAME")
      h = tf.nn.relu(h)
      h = tf.nn.conv2d(h, o["c2"].normalized(update_u), 1, "SAME")
      h = downsample(h)
      sc = tf.nn.conv2d(downsample(x), o["sc"].normalized(update_u), 1,
                        "SAME")
      h = h + sc
      for b in self.blocks:
        x0 = h
        x1 = tf.nn.relu(h)
        x1 = tf.nn.conv2d(x1, b["c1"].normalized(update_u), 1, "SAME")
        x1 = tf.nn.relu(x1)
        x1 = tf.nn.conv2d(x1, b["c2"].normalized(update_u), 1, "SAME")
        if b["down"]:
          x1 = downsample(x1)
        if b["sc"] is not None:
          sc = tf.nn.conv2d(x0, b["sc"].normalized(update_u), 1, "SAME")
          if b["down"]:
            sc = downsample(sc)
          x0 = sc
        h = x1 + x0
      h = tf.nn.relu(h)
      h = tf.reduce_sum(h, axis=[1, 2])  # global sum pool
      return tf.matmul(h, self.dense.normalized(update_u))

  g, d = Generator(), Discriminator()
  g_opt = tf.keras.optimizers.Adam(2e-4, beta_1=0.0, beta_2=0.9)
  d_opt = tf.keras.optimizers.Adam(2e-4, beta_1=0.0, beta_2=0.9)

  @tf.function
  def d_step(x_real, z):
    fake = g(z, training=True)
    with tf.GradientTape() as tape:
      loss = (tf.reduce_mean(tf.nn.relu(1.0 - d(x_real, update_u=True))) +
              tf.reduce_mean(tf.nn.relu(1.0 + d(fake, update_u=True))))
    grads = tape.gradient(loss, d.trainable())
    d_opt.apply_gradients(zip(grads, d.trainable()))
    return loss

  @tf.function
  def g_step(z):
    with tf.GradientTape() as tape:
      loss = -tf.reduce_mean(d(g(z, training=True), update_u=False))
    grads = tape.gradient(loss, g.trainable())
    g_opt.apply_gradients(zip(grads, g.trainable()))
    return loss

  if fused:
    tf_rng = tf.random.Generator.from_seed(0)

    @tf.function
    def outer_step():
      # RATIO unrolled D updates + 1 G update, all inputs generated
      # in-graph: no feed_dict, no per-update Python dispatch.
      d_loss = tf.constant(0.0)
      for _ in range(RATIO):
        x = tf_rng.normal([BATCH, RES, RES, 3])
        z = tf_rng.normal([BATCH, Z_DIM])
        fake = g(z, training=True)
        with tf.GradientTape() as tape:
          d_loss = (
              tf.reduce_mean(tf.nn.relu(1.0 - d(x, update_u=True)))
              + tf.reduce_mean(tf.nn.relu(1.0 + d(fake, update_u=True))))
        grads = tape.gradient(d_loss, d.trainable())
        d_opt.apply_gradients(zip(grads, d.trainable()))
      zg = tf_rng.normal([BATCH * G_MULT, Z_DIM])
      with tf.GradientTape() as tape:
        g_loss = -tf.reduce_mean(d(g(zg, training=True), update_u=False))
      grads = tape.gradient(g_loss, g.trainable())
      g_opt.apply_gradients(zip(grads, g.trainable()))
      return d_loss, g_loss

    d_loss, g_loss = outer_step()  # warmup / trace
    float(d_loss), float(g_loss)
    t0 = time.perf_counter()
    for _ in range(outer_steps):
      d_loss, g_loss = outer_step()
    float(d_loss), float(g_loss)  # host fetch fence
    dt = time.perf_counter() - t0
    return dict(impl="tf_fused",
                imgs_per_sec=outer_steps * RATIO * BATCH / dt,
                outer_steps=outer_steps, seconds=dt,
                tf_threads="default")

  rng = np.random.default_rng(0)

  def feed():
    # Fresh host numpy per call == feed_dict per sess.run.
    x = rng.standard_normal((BATCH, RES, RES, 3)).astype(np.float32)
    z = rng.standard_normal((BATCH, Z_DIM)).astype(np.float32)
    zg = rng.standard_normal((BATCH * G_MULT, Z_DIM)).astype(np.float32)
    return x, z, zg

  # Warmup / trace both graphs.
  x, z, zg = feed()
  float(d_step(x, z))
  float(g_step(zg))

  t0 = time.perf_counter()
  for _ in range(outer_steps):
    for _ in range(RATIO):
      x, z, _ = feed()
      d_loss = d_step(x, z)
    _, _, zg = feed()
    g_loss = g_step(zg)
  float(d_loss), float(g_loss)  # host fetch fence
  dt = time.perf_counter() - t0
  return dict(impl="tf", imgs_per_sec=outer_steps * RATIO * BATCH / dt,
              outer_steps=outer_steps, seconds=dt, tf_threads="default")


# --------------------------------------------------------------- JAX side
def run_jax(outer_steps: int) -> dict:
  import jax
  jax.config.update("jax_platforms", "cpu")  # env route unreliable here
  import jax.numpy as jnp

  import sys
  sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
  from __graft_entry__ import _models
  from wcgan_tpu.train import schedules
  from wcgan_tpu.train.state import create_state
  from wcgan_tpu.train.step import GANConfig, make_jit_step

  # f32 like the TF proxy (the reference era had no bf16); same math.
  g, d = _models(resolution=RES, z_dim=Z_DIM, dtype="float32")
  cfg = GANConfig(training_ratio=RATIO, generator_batch_multiple=G_MULT,
                  z_dim=Z_DIM, random_flip=False)
  g_tx, d_tx = schedules.adam(2e-4), schedules.adam(2e-4)
  state = create_state(g, d, g_tx, d_tx, jax.random.PRNGKey(0),
                       batch_size=BATCH, z_dim=Z_DIM,
                       image_shape=(RES, RES, 3))
  step_fn = make_jit_step(g, d, g_tx, d_tx, cfg, donate=True)
  real = jax.random.randint(jax.random.PRNGKey(1),
                            (RATIO, BATCH, RES, RES, 3), 0, 256
                            ).astype(jnp.uint8)
  labels = jnp.zeros((RATIO, BATCH), jnp.int32)
  state, metrics = step_fn(state, real, labels)
  float(metrics["d_loss"])
  t0 = time.perf_counter()
  for _ in range(outer_steps):
    state, metrics = step_fn(state, real, labels)
  float(metrics["d_loss"])
  dt = time.perf_counter() - t0
  return dict(impl="jax", imgs_per_sec=outer_steps * RATIO * BATCH / dt,
              outer_steps=outer_steps, seconds=dt)


def main() -> int:
  global RATIO
  p = argparse.ArgumentParser()
  p.add_argument("--impl", choices=["tf", "tf_fused", "jax"],
                 required=True)
  p.add_argument("--outer_steps", type=int, default=3)
  p.add_argument("--ratio", type=int, default=5,
                 help="D updates per outer step. The full 5:1 fused jax "
                      "program exceeded 2h of 1-core XLA compile time; "
                      "--ratio 1 keeps the per-update math identical on "
                      "both impls with a third of the graph")
  a = p.parse_args()
  RATIO = a.ratio
  if a.impl == "jax":
    out = run_jax(a.outer_steps)
  else:
    out = run_tf(a.outer_steps, fused=a.impl == "tf_fused")
  out["ratio"] = a.ratio
  out["imgs_per_sec"] = round(out["imgs_per_sec"], 2)
  out["seconds"] = round(out["seconds"], 2)
  print(json.dumps(out))
  return 0


if __name__ == "__main__":
  raise SystemExit(main())
