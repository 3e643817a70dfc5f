"""Flax model zoo: WC/SN layers, resblocks, generators, discriminators."""

from wcgan_tpu.models import blocks, discriminator, generator, layers  # noqa: F401
