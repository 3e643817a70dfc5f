"""wcgan_tpu — a TPU-native JAX/Pallas rebuild of the WC-GAN framework.

Re-implements the full capability surface of AliaksandrSiarohin/wc-gan
(*Whitening and Coloring batch transform for GANs*, Siarohin et al.,
ICLR 2019) as an idiomatic JAX / XLA / Pallas stack:

- ``wcgan_tpu.ops``      — pure-functional numerics: batch whitening
  (Newton–Schulz inverse square root), coloring transforms, spectral
  normalization power iteration, GAN losses, and the fused Pallas
  whitening+coloring TPU kernel.
- ``wcgan_tpu.models``   — flax modules: WC layers, SN conv/dense wrappers,
  ResNet/DCGAN generators & discriminators (projection-D, AC-GAN head).
- ``wcgan_tpu.parallel`` — mesh construction, shardings and the
  cross-replica whitening-moment reduction.
- ``wcgan_tpu.train``    — train state, the fused K-D-steps + 1-G-step
  XLA program, LR schedules, and the experiment Trainer.
- ``wcgan_tpu.data``     — dataset pipelines (CIFAR-10/100, STL-10,
  Tiny-ImageNet, ImageNet-64, MNIST/F-MNIST, synthetic).
- ``wcgan_tpu.eval``     — Inception Score / FID implemented on-device.
- ``wcgan_tpu.cli``      — the argparse surface mirroring the reference's
  ``run.py`` / ``gan/cmd.py`` flag contract (SURVEY.md §2a [U]).

Reference parity citations use the convention of SURVEY.md §0: the
upstream mount was empty at build time, so citations are
``path/to/file.py::Symbol [U]`` (reconstructed, unverified).
"""

__version__ = "0.1.0"
