"""Shared utilities: image grids, logging."""

from wcgan_tpu.utils.images import make_grid, save_png, to_uint8  # noqa: F401
from wcgan_tpu.utils.logging import MetricsLogger  # noqa: F401
