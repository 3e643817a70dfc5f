"""Single source of the per-config benchmark shapes (VERDICT r4 #1).

The five BASELINE.json per-chip config shapes plus the headline bench
shape, shared by ``bench_ablate.py``, ``scripts/mfu.py`` and
``scripts/step_attribution.py`` so throughput, MFU, and FLOPs
attribution all measure the SAME compiled programs — previously only
the headline CIFAR shape had an efficiency story (MFU + attribution
were hard-wired to it) while configs 2-5 had throughput numbers only.

Widths come from the models' ``preset_filters`` (paper §5
architectures); the headline shape equals the uncond config-2-class
CIFAR ResNet (G 256x3 + SN-D 128x4, hinge, D:G 5:1) that bench.py and
``__graft_entry__._models`` use. Reference parity map: BASELINE.json
"configs" 1-5 (SURVEY.md §2c).
"""

from __future__ import annotations

from typing import Dict

# One row per BASELINE config's per-chip shape. "headline" is the
# driver-metric shape (bench.py). cfg5 is the per-chip slice of the DP
# config (64px, 1000 classes, cWC via -sa — plain ucconv at 1000c is
# per-chip infeasible, see cli/presets.py's measured note).
CONFIGS: Dict[str, dict] = {
    "headline": dict(res=32, ncls=0, coloring="uconv", arch="res",
                     ratio=5, loss="hinge"),
    "cfg1": dict(res=32, ncls=0, coloring="uconv", arch="dcgan",
                 ratio=1, loss="ns"),
    "cfg2": dict(res=32, ncls=10, coloring="ucconv", arch="res",
                 ratio=5, loss="hinge"),
    "cfg3": dict(res=48, ncls=0, coloring="uconv", arch="res",
                 ratio=5, loss="hinge"),
    "cfg4": dict(res=64, ncls=200, coloring="ucconv-sa", arch="res",
                 ratio=5, loss="hinge"),
    "cfg5": dict(res=64, ncls=1000, coloring="ucconv-sa", arch="res",
                 ratio=5, loss="hinge"),
    # AC-GAN at the cfg2-class CIFAR shape: aux classifier head on a
    # non-projection SN-D, aux CE in both losses (VERDICT r4 #4 — the
    # objective needed at-shape evidence beyond unit tests).
    "acgan": dict(res=32, ncls=10, coloring="ucconv", arch="res",
                  ratio=5, loss="hinge", acgan=True),
}


def build_models(config: str, dtype: str = "bfloat16",
                 ns_iters: int = 15, ns_scaling: str = "trace",
                 zdim: int = 128, block_norm: str = "d"):
  """(Generator, Discriminator, spec) at ``config``'s paper widths."""
  from wcgan_tpu.models.discriminator import (Discriminator,
                                              DiscriminatorConfig)
  from wcgan_tpu.models.discriminator import preset_filters as d_presets
  from wcgan_tpu.models.generator import Generator, GeneratorConfig
  from wcgan_tpu.models.generator import preset_filters as g_presets
  if config not in CONFIGS:
    raise KeyError(f"unknown config {config!r}; choose from "
                   f"{sorted(CONFIGS)}")
  spec = dict(CONFIGS[config])
  gf = g_presets(spec["arch"], spec["res"])
  df, down = d_presets(spec["arch"], spec["res"])
  acgan = bool(spec.get("acgan"))
  gcfg = GeneratorConfig(
      arch=spec["arch"], z_dim=zdim, resolution=spec["res"],
      base_resolution=spec["res"] // (2 ** len(gf)),
      filters=gf, num_classes=spec["ncls"], block_norm=block_norm,
      last_norm=block_norm, block_coloring=spec["coloring"],
      last_coloring=spec["coloring"], ns_iters=ns_iters,
      ns_scaling=ns_scaling, dtype=dtype)
  dcfg = DiscriminatorConfig(
      arch=spec["arch"], resolution=spec["res"], filters=df,
      downsample=down, num_classes=spec["ncls"],
      projection=spec["ncls"] > 0 and not acgan, ac_gan=acgan,
      ns_iters=ns_iters, ns_scaling=ns_scaling, dtype=dtype)
  return Generator(cfg=gcfg), Discriminator(cfg=dcfg), spec


def build_bench(config: str, batch: int = 64, dtype: str = "bfloat16",
                ns_iters: int = 15, ns_scaling: str = "trace",
                d_fake_stats: str = "batch", unroll_d_scan: bool = False,
                donate: bool = True, zdim: int = 128,
                block_norm: str = "d"):
  """Everything a perf tool needs for one measured program.

  Returns ``(step_fn, state, (real, labels), spec)`` with spec carrying
  res/ratio/ncls so callers compute imgs/sec = steps*ratio*batch/dt.
  """
  import jax
  import jax.numpy as jnp

  from wcgan_tpu.train import schedules
  from wcgan_tpu.train.state import create_state
  from wcgan_tpu.train.step import GANConfig, make_jit_step

  g, d, spec = build_models(config, dtype=dtype, ns_iters=ns_iters,
                            ns_scaling=ns_scaling, zdim=zdim,
                            block_norm=block_norm)
  res, ncls, ratio = spec["res"], spec["ncls"], spec["ratio"]
  cfg = GANConfig(loss=spec["loss"], training_ratio=ratio,
                  generator_batch_multiple=2, z_dim=zdim,
                  random_flip=True, num_classes=ncls,
                  gan_type="acgan" if spec.get("acgan") else "gan",
                  d_fake_stats=d_fake_stats, unroll_d_scan=unroll_d_scan)
  g_tx, d_tx = schedules.adam(2e-4), schedules.adam(2e-4)
  state = create_state(g, d, g_tx, d_tx, jax.random.PRNGKey(0),
                       batch_size=batch, z_dim=zdim,
                       image_shape=(res, res, 3), num_classes=ncls)
  step_fn = make_jit_step(g, d, g_tx, d_tx, cfg, donate=donate)
  real = jax.random.randint(jax.random.PRNGKey(1),
                            (ratio, batch, res, res, 3), 0, 256
                            ).astype(jnp.uint8)
  labels = jax.random.randint(jax.random.PRNGKey(2), (ratio, batch), 0,
                              max(ncls, 1)).astype(jnp.int32)
  return step_fn, state, (real, labels), spec
