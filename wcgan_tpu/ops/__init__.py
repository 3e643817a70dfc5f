"""Pure-functional numerics for the WC-GAN TPU stack."""

from wcgan_tpu.ops import coloring, losses, pallas_wc, sn, whiten  # noqa: F401
