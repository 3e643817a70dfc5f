"""Test configuration: run everything on a virtual 8-device CPU mesh.

Local hardware is a single TPU chip behind an experimental PJRT platform;
the fake-mesh CPU path is both the fast test vehicle and the only way to
exercise multi-device sharding (SURVEY.md §4). Environment must be set
before jax initializes its backends — hence module-scope, before any
wcgan_tpu import in test modules.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
  os.environ["XLA_FLAGS"] = (
      _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")


@pytest.fixture
def rng():
  return np.random.default_rng(0)
