"""Dataset pipelines: local-file loaders + synthetic data.

The reference downloads CIFAR/STL/Tiny-ImageNet at run time
(``dataset.py::get_dataset`` [U]); this environment has zero egress, so
every loader reads the canonical on-disk archive layout from
``--data_dir`` and documents the expected files. ``synthetic`` needs no
files and backs the smoke tests and benches.
"""

from wcgan_tpu.data.base import ArrayDataset  # noqa: F401
from wcgan_tpu.data.datasets import DATASETS, get_dataset  # noqa: F401
