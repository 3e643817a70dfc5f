"""Utils coverage: grids, PNG IO, metrics logger, on-device input prep."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from wcgan_tpu.train.step import prepare_real
from wcgan_tpu.utils.images import make_grid, save_png, to_uint8
from wcgan_tpu.utils.logging import MetricsLogger


def test_to_uint8_range():
  x = np.array([[-1.0, 0.0, 1.0]], np.float32).reshape(1, 1, 3, 1)
  np.testing.assert_array_equal(to_uint8(x).ravel(), [0, 127, 255])
  u = np.zeros((1, 1, 1, 1), np.uint8)
  assert to_uint8(u).dtype == np.uint8


def test_make_grid_layout():
  imgs = np.stack([np.full((4, 4, 3), i, np.uint8) for i in range(6)])
  grid = make_grid(imgs, cols=3)
  assert grid.shape == (8, 12, 3)
  assert grid[0, 0, 0] == 0 and grid[0, 4, 0] == 1
  assert grid[4, 0, 0] == 3 and grid[4, 8, 0] == 5


def test_save_png_roundtrip(tmp_path):
  from PIL import Image
  rgb = np.random.default_rng(0).integers(0, 256, (8, 8, 3), np.uint8)
  p = str(tmp_path / "x.png")
  save_png(p, rgb)
  np.testing.assert_array_equal(np.asarray(Image.open(p)), rgb)
  gray = rgb[..., :1]
  save_png(str(tmp_path / "g.png"), gray)  # 1-channel squeeze path


def test_metrics_logger(tmp_path):
  lg = MetricsLogger(str(tmp_path), echo=False)
  lg.epoch_line(3, {"d_loss": 0.5}, extra="imgs/sec = 10.0")
  lg.jsonl({"epoch": 3, "d_loss": 0.5})
  text = open(os.path.join(tmp_path, "log.txt")).read()
  assert "Epoch 3: d_loss = 0.50000; imgs/sec = 10.0" in text
  rec = json.loads(open(os.path.join(tmp_path, "metrics.jsonl")).read())
  assert rec["epoch"] == 3 and "ts" in rec


def test_prepare_real_normalizes_uint8():
  x = jnp.full((2, 4, 4, 4, 3), 255, jnp.uint8)
  out = prepare_real(x, jax.random.PRNGKey(0), random_flip=False)
  np.testing.assert_allclose(np.asarray(out), 1.0)
  x0 = jnp.zeros((2, 4, 4, 4, 3), jnp.uint8)
  out0 = prepare_real(x0, jax.random.PRNGKey(0), random_flip=False)
  np.testing.assert_allclose(np.asarray(out0), -1.0)


def test_prepare_real_flip_is_horizontal_per_sample():
  # Asymmetric in W: flipping must reverse axis -2 only.
  base = jnp.arange(4, dtype=jnp.float32).reshape(1, 1, 1, 4, 1)
  x = jnp.broadcast_to(base, (1, 64, 2, 4, 1))
  out = np.asarray(prepare_real(x, jax.random.PRNGKey(3),
                                random_flip=True))
  fwd = np.array([0, 1, 2, 3], np.float32)
  rev = fwd[::-1]
  n_flipped = 0
  for i in range(64):
    row = out[0, i, 0, :, 0]
    assert np.allclose(row, fwd) or np.allclose(row, rev)
    # Both H rows of one sample must agree (flip is per sample).
    np.testing.assert_array_equal(out[0, i, 0], out[0, i, 1])
    n_flipped += int(np.allclose(row, rev))
  assert 10 < n_flipped < 54  # ~Bernoulli(0.5)
