"""Test configuration: run everything on a virtual 8-device CPU mesh.

Local hardware is a single TPU chip behind an experimental PJRT platform
(the "axon" tunnel); the fake-mesh CPU path is both the fast test vehicle
and the only way to exercise multi-device sharding (SURVEY.md §4).

Two environment hazards must be neutralized *before* jax initializes:

1. ``JAX_PLATFORMS=axon`` is pinned in the session env — tests must not
   contend for the single-tenant TPU tunnel.
2. An ``/root/.axon_site/sitecustomize.py`` hook registers the axon PJRT
   plugin with ``remote_compile=True`` in *every* interpreter when
   ``PALLAS_AXON_POOL_IPS`` is set. That routes each XLA compilation
   through the tunnel relay — measured ~70x wall-clock slowdown for the
   CPU test suite (blocked, not computing). sitecustomize runs before
   conftest, so the only reliable fix is to re-exec the test process once
   with the trigger variable scrubbed.

Set ``WCGAN_TEST_TPU=1`` to opt in to on-device tests (skips both fixes).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
  os.environ["XLA_FLAGS"] = (
      _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

if not os.environ.get("WCGAN_TEST_TPU"):
  # The env-var route (JAX_PLATFORMS=cpu) is NOT sufficient here: the
  # sitecustomize hook imports jax before conftest runs, so the env is
  # already snapshotted. The config API overrides it post-import.
  jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "float32")

# This machine has a single CPU core; XLA compiles dominate test wall-time.
# The persistent compilation cache makes repeat runs skip recompiles.
_CACHE = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture
def rng():
  return np.random.default_rng(0)
