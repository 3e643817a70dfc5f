"""h5 <-> npz converter roundtrip + CLI weight-loader key mapping."""

import json

import numpy as np
import pytest

from wcgan_tpu.tools.h5_convert import h5_flat, h5_to_npz, npz_to_h5


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


def test_h5_flat_key_map_collision_is_loud(tmp_path):
  """Two source datasets mapped to one destination must raise, not
  silently last-write-win (a wrong-weights load would be invisible)."""
  npz1, h5 = tmp_path / "a.npz", tmp_path / "a.h5"
  np.savez(npz1, **{"a/w": np.ones(2, np.float32),
                    "b/w": np.zeros(2, np.float32)})
  npz_to_h5(str(npz1), str(h5))
  with pytest.raises(ValueError, match="duplicate destination"):
    h5_flat(str(h5), key_map={"a/w": "b/w"})


def test_cli_loader_per_model_key_map(tmp_path):
  """--checkpoint_key_map with {'generator': ..., 'discriminator': ...}
  sections: each model's load applies only its own table (reference
  Keras default layer names collide between G and D)."""
  from wcgan_tpu.cli.run import _load_weights_npz
  import jax

  params = {"dense": {"kernel": np.zeros((2, 2), np.float32)}}
  dst_key = "/".join(map(
      str, jax.tree_util.tree_flatten_with_path(params)[0][0][0]))
  npz = tmp_path / "w.npz"
  np.savez(npz, **{"keras_dense_1": np.ones((2, 2), np.float32)})
  kmap = tmp_path / "map.json"
  kmap.write_text(json.dumps({
      "generator": {"keras_dense_1": dst_key},
      "discriminator": {"keras_dense_1": "somewhere/else"}}))
  out = _load_weights_npz(params, str(npz), str(kmap),
                          model="generator")
  np.testing.assert_array_equal(out["dense"]["kernel"],
                                np.ones((2, 2), np.float32))
  with pytest.raises(KeyError):  # D's section maps it elsewhere
    _load_weights_npz(params, str(npz), str(kmap),
                      model="discriminator")


def test_sectioned_key_map_validates_section_names(tmp_path):
  """Advisor r3: a typo'd section name ('generater') used to silently
  drop the whole rename table; now unknown sections raise, and a
  sectioned map lacking the selected model's section says so loudly
  instead of silently applying zero renames."""
  from wcgan_tpu.cli.run import _load_weights_npz
  import jax

  params = {"dense": {"kernel": np.zeros((2, 2), np.float32)}}
  dst_key = "/".join(map(
      str, jax.tree_util.tree_flatten_with_path(params)[0][0][0]))
  npz = tmp_path / "w.npz"
  np.savez(npz, **{dst_key: np.ones((2, 2), np.float32)})

  bad = tmp_path / "bad.json"
  bad.write_text(json.dumps({"generater": {"a": "b"}}))
  with pytest.raises(ValueError, match="unknown section.*generater"):
    _load_weights_npz(params, str(npz), str(bad), model="generator")

  # Valid sectioned map with no section for this model: load proceeds
  # (zero renames is correct here) but the absence is logged.
  partial = tmp_path / "partial.json"
  partial.write_text(json.dumps({"discriminator": {"x": "y"}}))
  lines = []
  out = _load_weights_npz(params, str(npz), str(partial),
                          model="generator", log=lines.append)
  np.testing.assert_array_equal(out["dense"]["kernel"],
                                np.ones((2, 2), np.float32))
  assert any("no 'generator' section" in l for l in lines)


def test_shipped_wc_cond_fold_keymap_and_missing_init(tmp_path):
  """Migration across the two documented checkpoint-tree breaks on a
  REAL conditional param tree: the shipped
  docs/keymaps/wc_cond_fold_pre_r2.json regex map must invert the r2
  conditional-W-fold scope move (ROADMAP #8: coloring params lived under
  color/), and --checkpoint_missing init must bridge the late-r3
  conv_sc addition (ROADMAP #9: pre-fix exports have no shortcut conv).
  Every surviving key loads bit-identically; conv_sc stays at init."""
  import os

  import jax
  import jax.numpy as jnp

  from wcgan_tpu.cli.run import _load_weights_npz
  from wcgan_tpu.models.generator import Generator, GeneratorConfig

  g = Generator(cfg=GeneratorConfig(
      z_dim=8, resolution=16, base_resolution=4, filters=(8, 8),
      block_norm="d", block_coloring="ucconv", last_norm="d",
      last_coloring="ucconv", num_classes=3, ns_iters=4))
  z = jax.random.normal(jax.random.PRNGKey(0), (6, 8))
  y = jnp.arange(6, dtype=jnp.int32) % 3
  params = g.init(jax.random.PRNGKey(1), z, y, train=True)["params"]
  flat = {"/".join(map(str, k)): np.asarray(v) for k, v in
          jax.tree_util.tree_flatten_with_path(params)[0]}

  fold_names = ("gamma_a", "beta_a", "gamma_c", "beta_c", "basis",
                "embedding")
  pre, dropped = {}, []
  for k, v in flat.items():
    if "conv_sc" in k:
      dropped.append(k)   # pre-shortcut-fix export: key absent
      continue
    scope, _, name = k.rpartition("/")
    if name.strip("[]'") in fold_names:
      # pre-fold export: color/ submodule scope (export_weights' flat
      # keys are bracketed DictKey strings)
      k = f"{scope}/['color']/{name}"
    pre[k] = v + 1.0     # shift so a real load is distinct from init
  assert dropped, "fixture lost its teeth: no conv_sc in the tree"
  assert any("color" in k for k in pre)
  npz = tmp_path / "pre_break.npz"
  np.savez(npz, **pre)

  kmap = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                      "keymaps", "wc_cond_fold_pre_r2.json")
  msgs = []
  out = _load_weights_npz(params, str(npz), kmap, model="generator",
                          missing="init", log=msgs.append)
  out_flat = {"/".join(map(str, k)): np.asarray(v) for k, v in
              jax.tree_util.tree_flatten_with_path(out)[0]}
  for k, v in flat.items():
    if k in dropped:
      np.testing.assert_array_equal(out_flat[k], v)        # kept at init
    else:
      np.testing.assert_array_equal(out_flat[k], v + 1.0)  # loaded
  assert any("kept at init" in m for m in msgs)
  # Strict default refuses the same file, pointing at the flag.
  with pytest.raises(KeyError, match="checkpoint_missing"):
    _load_weights_npz(params, str(npz), kmap, model="generator")


def test_bench_shapes_cover_all_baseline_configs():
  """tools/bench_shapes single-sources the per-config perf shapes
  (VERDICT r4 #1): all five BASELINE configs + the headline bench shape
  construct, with widths matching the models' preset_filters."""
  from wcgan_tpu.models.discriminator import preset_filters as d_presets
  from wcgan_tpu.models.generator import preset_filters as g_presets
  from wcgan_tpu.tools.bench_shapes import CONFIGS, build_models

  assert set(CONFIGS) == {"headline", "cfg1", "cfg2", "cfg3", "cfg4",
                          "cfg5", "acgan"}
  for name, spec in CONFIGS.items():
    g, d, out_spec = build_models(name)
    assert out_spec["ratio"] == spec["ratio"]
    assert tuple(g.cfg.filters) == tuple(g_presets(spec["arch"],
                                                   spec["res"]))
    df, down = d_presets(spec["arch"], spec["res"])
    assert tuple(d.cfg.filters) == tuple(df)
    assert tuple(d.cfg.downsample) == tuple(down)
    assert g.cfg.num_classes == d.cfg.num_classes == spec["ncls"]
    acgan = bool(spec.get("acgan"))
    assert d.cfg.ac_gan == acgan
    assert d.cfg.projection == (spec["ncls"] > 0 and not acgan)
  # The headline row must equal the driver-metric bench.py shape.
  g, _, _ = build_models("headline")
  assert tuple(g.cfg.filters) == (256, 256, 256)
  import pytest
  with pytest.raises(KeyError):
    build_models("nope")
