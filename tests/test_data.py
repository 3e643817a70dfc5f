"""Dataset loaders against synthesized canonical archive layouts, and
ArrayDataset iteration semantics."""

import gzip
import os
import pickle

import numpy as np
import pytest

from wcgan_tpu.data import get_dataset
from wcgan_tpu.data.base import ArrayDataset


def _write_cifar10(root, n_per_batch=20):
  d = os.path.join(root, "cifar-10-batches-py")
  os.makedirs(d)
  rng = np.random.default_rng(0)
  for i in range(1, 6):
    batch = {b"data": rng.integers(0, 256, (n_per_batch, 3072),
                                   dtype=np.uint8).astype(np.uint8),
             b"labels": list(rng.integers(0, 10, n_per_batch))}
    with open(os.path.join(d, f"data_batch_{i}"), "wb") as f:
      pickle.dump(batch, f)


def test_cifar10_loader(tmp_path):
  _write_cifar10(str(tmp_path))
  ds = get_dataset("cifar10", batch_size=10, data_dir=str(tmp_path),
                   conditional=True)
  assert ds.images.shape == (100, 32, 32, 3)
  assert ds.images.dtype == np.uint8
  assert ds.num_classes == 10
  imgs, labels = ds.next_batches(2)
  assert imgs.shape == (2, 10, 32, 32, 3)
  assert labels.shape == (2, 10)


def test_cifar100_loader(tmp_path):
  d = tmp_path / "cifar-100-python"
  d.mkdir()
  rng = np.random.default_rng(1)
  batch = {b"data": rng.integers(0, 256, (30, 3072), dtype=np.uint8),
           b"fine_labels": list(rng.integers(0, 100, 30))}
  with open(d / "train", "wb") as f:
    pickle.dump(batch, f)
  ds = get_dataset("cifar100", batch_size=5, data_dir=str(tmp_path),
                   conditional=True)
  assert ds.images.shape == (30, 32, 32, 3)
  assert ds.num_classes == 100


def test_mnist_loader(tmp_path):
  d = tmp_path / "mnist"
  d.mkdir()
  rng = np.random.default_rng(2)
  n = 12
  imgs = rng.integers(0, 256, (n, 28, 28), dtype=np.uint8)
  header = (b"\x00\x00\x08\x03" + n.to_bytes(4, "big")
            + (28).to_bytes(4, "big") + (28).to_bytes(4, "big"))
  with gzip.open(d / "train-images-idx3-ubyte.gz", "wb") as f:
    f.write(header + imgs.tobytes())
  labels = rng.integers(0, 10, n, dtype=np.uint8)
  with gzip.open(d / "train-labels-idx1-ubyte.gz", "wb") as f:
    f.write(b"\x00\x00\x08\x01" + n.to_bytes(4, "big") + labels.tobytes())
  ds = get_dataset("mnist", batch_size=4, data_dir=str(tmp_path),
                   conditional=True)
  assert ds.images.shape == (12, 32, 32, 1)  # padded 28 -> 32
  np.testing.assert_array_equal(ds.labels, labels.astype(np.int32))


def test_stl10_loader_unconditional(tmp_path):
  d = tmp_path / "stl10_binary"
  d.mkdir()
  rng = np.random.default_rng(3)
  raw = rng.integers(0, 256, (6, 3, 96, 96), dtype=np.uint8)
  raw.tofile(d / "unlabeled_X.bin")
  ds = get_dataset("stl10", batch_size=2, data_dir=str(tmp_path),
                   conditional=False)
  assert ds.images.shape == (6, 48, 48, 3)
  assert ds.num_classes == 0
  # Cache file created; second load uses it.
  assert (d / "stl48_unlabeled_cache.npz").exists()
  ds2 = get_dataset("stl10", batch_size=2, data_dir=str(tmp_path))
  np.testing.assert_array_equal(ds.images, ds2.images)


def test_stl10_split_caches_do_not_collide(tmp_path):
  """ADVICE r1: conditional (labeled train) and unconditional (unlabeled)
  STL-10 must use split-specific caches — never serve one to the other."""
  d = tmp_path / "stl10_binary"
  d.mkdir()
  rng = np.random.default_rng(5)
  rng.integers(0, 256, (6, 3, 96, 96), dtype=np.uint8).tofile(
      d / "unlabeled_X.bin")
  rng.integers(0, 256, (4, 3, 96, 96), dtype=np.uint8).tofile(
      d / "train_X.bin")
  (rng.integers(1, 11, 4).astype(np.uint8)).tofile(d / "train_y.bin")
  # Unconditional first (populates its cache), then conditional.
  ds_u = get_dataset("stl10", batch_size=2, data_dir=str(tmp_path),
                     conditional=False)
  ds_c = get_dataset("stl10", batch_size=2, data_dir=str(tmp_path),
                     conditional=True)
  assert ds_u.images.shape[0] == 6
  assert ds_c.images.shape[0] == 4
  assert ds_c.labels is not None and ds_c.labels.min() >= 0
  assert (d / "stl48_unlabeled_cache.npz").exists()
  assert (d / "stl48_train_cache.npz").exists()
  # A labelless cache under the conditional name must raise, not serve
  # all-zero labels.
  np.savez(d / "stl48_train_cache.npz",
           x=np.zeros((4, 48, 48, 3), np.uint8))
  with pytest.raises(ValueError):
    get_dataset("stl10", batch_size=2, data_dir=str(tmp_path),
                conditional=True)


def test_imagenet64_loader(tmp_path):
  d = tmp_path / "imagenet64"
  d.mkdir()
  rng = np.random.default_rng(4)
  np.savez(d / "train_data_batch_1.npz",
           data=rng.integers(0, 256, (8, 12288), dtype=np.uint8),
           labels=rng.integers(1, 1001, 8))
  ds = get_dataset("imagenet64", batch_size=4, data_dir=str(tmp_path),
                   conditional=True)
  assert ds.images.shape == (8, 64, 64, 3)
  assert ds.labels.min() >= 0 and ds.labels.max() <= 999


def test_array_dataset_epoch_semantics():
  imgs = np.arange(20, dtype=np.uint8).reshape(20, 1, 1, 1) * np.ones(
      (20, 2, 2, 3), np.uint8)
  ds = ArrayDataset(imgs, None, batch_size=4)
  assert ds.number_of_batches_per_epoch == 5
  seen = []
  for _ in range(5):
    b, _ = ds.next_batches(1)
    seen.extend(b[0, :, 0, 0, 0].tolist())
  assert sorted(seen) == list(range(20))  # full epoch, no repeats


def test_fixed_test_batch_deterministic():
  imgs = np.zeros((16, 2, 2, 3), np.uint8)
  ds = ArrayDataset(imgs, np.zeros(16, np.int32), batch_size=4,
                    num_classes=4)
  z1, y1 = ds.test_batch(8)
  z2, y2 = ds.test_batch(8)
  np.testing.assert_array_equal(z1, z2)
  np.testing.assert_array_equal(y1, y2)
  assert set(y1.tolist()) == {0, 1, 2, 3}


def test_unknown_dataset_raises():
  with pytest.raises(ValueError):
    get_dataset("imagenet1k", batch_size=4)
