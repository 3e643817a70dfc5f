"""Device mesh + shardings for data-parallel GAN training.

The reference is strictly single-GPU/single-process (SURVEY.md §2b: no
multi_gpu_model / Horovod / tf.distribute anywhere [U]); all parallelism
here is new capability mandated by BASELINE.json:"north_star" — DP over a
1-D ``data`` mesh with cross-replica whitening-moment all-reduce.

Design: collectives are reached only through ``jax.lax.pmean``/``psum`` on
the named axis inside ``shard_map`` (ICI within a slice); no raw backend
calls. The same code runs on a virtual 8-device CPU mesh for tests
(SURVEY.md §4) and on real pod slices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
  """1-D data-parallel mesh over all (or the given) devices."""
  devices = list(devices) if devices is not None else jax.devices()
  return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
  """Shard the leading (batch) dim across the data axis."""
  return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
  """Fully replicated (params, optimizer state, scalars)."""
  return NamedSharding(mesh, P())
