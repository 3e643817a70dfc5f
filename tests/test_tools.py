"""h5 <-> npz converter roundtrip."""

import numpy as np

from wcgan_tpu.tools.h5_convert import h5_to_npz, npz_to_h5


def test_h5_npz_roundtrip(tmp_path, rng):
  npz1 = tmp_path / "w.npz"
  h5 = tmp_path / "w.h5"
  npz2 = tmp_path / "w2.npz"
  data = {"block0/conv1/kernel": rng.standard_normal((3, 3, 4, 8)
                                                     ).astype(np.float32),
          "fc_out/bias": np.zeros(1, np.float32)}
  np.savez(npz1, **data)
  npz_to_h5(str(npz1), str(h5))
  manifest = h5_to_npz(str(h5), str(npz2))
  assert manifest["block0/conv1/kernel"] == (3, 3, 4, 8)
  loaded = dict(np.load(str(npz2)))
  for k, v in data.items():
    np.testing.assert_array_equal(loaded[k], v)


def test_h5_to_npz_key_map(tmp_path, rng):
  npz1, h5, npz2 = (tmp_path / n for n in ("a.npz", "a.h5", "b.npz"))
  np.savez(npz1, **{"old/name": np.ones(3, np.float32)})
  npz_to_h5(str(npz1), str(h5))
  h5_to_npz(str(h5), str(npz2), key_map={"old/name": "new/name"})
  assert "new/name" in dict(np.load(str(npz2)))
