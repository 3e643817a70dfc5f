"""Mesh construction and sharding helpers."""

from wcgan_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS, data_sharding, make_mesh, replicated_sharding)
