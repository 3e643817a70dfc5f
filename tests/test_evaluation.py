"""Evaluation tests: IS/FID math vs scipy/hand cases, InceptionV3
plumbing, scorer pipeline (SURVEY.md §4: FID/IS math against scipy on
fixed activations)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from wcgan_tpu.evaluation import metrics


def test_inception_score_uniform_is_one():
  # p(y|x) == marginal for every x -> KL 0 -> IS 1.
  probs = jnp.full((100, 10), 0.1)
  mean, std = metrics.inception_score(probs, splits=5)
  np.testing.assert_allclose(float(mean), 1.0, atol=1e-5)
  np.testing.assert_allclose(float(std), 0.0, atol=1e-5)


def test_inception_score_onehot_is_num_classes():
  # Perfectly confident + uniform marginal -> IS = num_classes.
  k = 10
  probs = jnp.eye(k)[jnp.arange(200) % k]
  mean, _ = metrics.inception_score(probs, splits=4)
  np.testing.assert_allclose(float(mean), k, rtol=1e-4)


def test_frechet_distance_zero_for_identical():
  rng = np.random.default_rng(0)
  a = rng.standard_normal((400, 32)).astype(np.float32)
  mu, sig = metrics.moments_from_activations(jnp.asarray(a))
  d = metrics.fid_from_moments(mu, sig, mu, sig)
  assert abs(d) < 1e-2


def test_frechet_distance_matches_scipy():
  rng = np.random.default_rng(1)
  a = rng.standard_normal((600, 48)).astype(np.float32)
  b = (rng.standard_normal((500, 48)) * 1.4 + 0.3).astype(np.float32)
  mu1, s1 = metrics.moments_from_activations(jnp.asarray(a))
  mu2, s2 = metrics.moments_from_activations(jnp.asarray(b))
  ours = metrics.fid_from_moments(mu1, s1, mu2, s2, num_iters=30)

  mu1n, mu2n = np.asarray(mu1), np.asarray(mu2)
  s1n, s2n = np.asarray(s1, np.float64), np.asarray(s2, np.float64)
  covmean = scipy.linalg.sqrtm(s1n @ s2n)
  ref = (np.sum((mu1n - mu2n) ** 2) + np.trace(s1n) + np.trace(s2n)
         - 2 * np.trace(covmean.real))
  np.testing.assert_allclose(ours, ref, rtol=2e-3)


def test_frechet_distance_rank_deficient():
  """FID's classic failure mode: N < D covariances are singular."""
  rng = np.random.default_rng(2)
  a = rng.standard_normal((40, 64)).astype(np.float32)  # rank 40 < 64
  b = rng.standard_normal((48, 64)).astype(np.float32)
  mu1, s1 = metrics.moments_from_activations(jnp.asarray(a))
  mu2, s2 = metrics.moments_from_activations(jnp.asarray(b))
  ours = metrics.fid_from_moments(mu1, s1, mu2, s2, num_iters=40)
  assert np.isfinite(ours) and ours > 0


def test_frechet_distance_eigh_matches_scipy_near_singular():
  """ADVICE r1: at FID scale (10k samples, 2048 dims) the covariances are
  near-singular and Newton–Schulz may be unconverged. The scoring path
  uses the exact eigh factorization — validate it against float64 scipy
  on a rank-deficient, badly scaled case."""
  rng = np.random.default_rng(7)
  # 120 samples in 256 dims (rank << dim), anisotropic scales ~ 1e3 range.
  scales = np.logspace(-1.5, 1.5, 256)
  a = (rng.standard_normal((120, 256)) * scales).astype(np.float32)
  b = (rng.standard_normal((150, 256)) * scales[::-1] + 0.5).astype(
      np.float32)
  mu1, s1 = metrics.moments_from_activations(jnp.asarray(a))
  mu2, s2 = metrics.moments_from_activations(jnp.asarray(b))
  ours = metrics.fid_from_moments(mu1, s1, mu2, s2, method="eigh")

  mu1n, mu2n = np.asarray(mu1), np.asarray(mu2)
  s1n, s2n = np.asarray(s1, np.float64), np.asarray(s2, np.float64)
  offset = np.eye(256) * 1e-10
  covmean = scipy.linalg.sqrtm((s1n + offset) @ (s2n + offset))
  ref = (np.sum((mu1n - mu2n) ** 2) + np.trace(s1n) + np.trace(s2n)
         - 2 * np.trace(covmean.real))
  np.testing.assert_allclose(ours, ref, rtol=1e-3)
  # The matmul-only NS path must stay within 1% of the exact oracle on
  # this conditioning (its documented validity envelope).
  ns = metrics.fid_from_moments(mu1, s1, mu2, s2, method="ns",
                                num_iters=40)
  np.testing.assert_allclose(ns, ref, rtol=1e-2)


def test_scorer_tail_padding_is_static_shape():
  """ADVICE r1: the tail chunk must be padded to the FULL batch shape
  (np.zeros_like(chunk[:pad]) under-padded whenever remainder < pad)."""
  from wcgan_tpu.evaluation.scorer import _activations

  shapes = []

  def fake_apply(x):
    shapes.append(tuple(x.shape))
    return jnp.zeros((x.shape[0], 4)), jnp.full((x.shape[0], 3), 1 / 3)

  imgs = np.zeros((10, 2, 2, 3), np.uint8)  # batch 8 -> tail of 2 (< pad 6)
  pools, probs = _activations(fake_apply, imgs, batch=8)
  assert pools.shape == (10, 4) and probs.shape == (10, 3)
  assert set(shapes) == {(8, 2, 2, 3)}  # one static shape, no recompiles


def test_scorer_selective_fetch():
  """r3 eval-path fix: IS fetches only probs and FID only pool — the
  unwanted output must not be materialized on host (halves tunnel
  transfer in 50k-sample runs)."""
  from wcgan_tpu.evaluation.scorer import _activations

  def fake_apply(x):
    return jnp.zeros((x.shape[0], 4)), jnp.full((x.shape[0], 3), 1 / 3)

  imgs = np.zeros((6, 2, 2, 3), np.uint8)
  pools, probs = _activations(fake_apply, imgs, batch=3, want_pool=False)
  assert pools is None and probs.shape == (6, 3)
  pools, probs = _activations(fake_apply, imgs, batch=3,
                              want_probs=False)
  assert probs is None and pools.shape == (6, 4)


def test_scorer_pool_rows_cap():
  """pool_rows caps the pool fetch to the first N rows (FID piggyback
  on the IS pass) while probs still cover every row."""
  from wcgan_tpu.evaluation.scorer import _activations

  def fake_apply(x):
    return (jnp.arange(x.shape[0], dtype=jnp.float32)[:, None]
            * jnp.ones((1, 4))), jnp.full((x.shape[0], 3), 1 / 3)

  imgs = np.zeros((10, 2, 2, 3), np.uint8)
  pools, probs = _activations(fake_apply, imgs, batch=4, pool_rows=6)
  assert probs.shape == (10, 3)
  assert pools.shape == (6, 4)  # 4 from chunk 1 + first 2 of chunk 2


def test_scorer_fid_piggyback_matches_separate(monkeypatch):
  """With IS+FID both on, the scorer reuses the IS pass's first
  samples_fid images for FID (Trainer.generate reseeds per call, so
  they are bit-identical) — results must equal separately-computed
  metrics, from ONE generate call. Inception is stubbed with a tiny
  deterministic net; the logic under test is all in the scorer."""
  from wcgan_tpu.data import get_dataset
  from wcgan_tpu.evaluation import scorer as scorer_mod

  class TinyNet:
    def apply(self, variables, x):
      pool = jnp.mean(x, axis=(1, 2))              # (N, 3)
      logits = jnp.concatenate([pool, -pool], -1)  # (N, 6)
      return pool, logits

  monkeypatch.setattr(scorer_mod.inception_v3, "init_params",
                      lambda rng=None: (TinyNet(), {}))
  ds = get_dataset("synthetic", batch_size=8, synthetic_size=64)

  class FakeTrainer:
    calls = 0

    def generate(self, n, batch=256, rng_seed=0):
      type(self).calls += 1
      rng = np.random.default_rng(rng_seed)
      return rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8)

  both = scorer_mod.make_scorer(
      ds, compute_is=True, compute_fid=True, samples_inception=32,
      samples_fid=16, batch=8)
  out_both = both(FakeTrainer())
  gen_calls_both = FakeTrainer.calls
  FakeTrainer.calls = 0
  is_only = scorer_mod.make_scorer(
      ds, compute_is=True, compute_fid=False, samples_inception=32,
      batch=8)
  fid_only = scorer_mod.make_scorer(
      ds, compute_is=False, compute_fid=True, samples_fid=16, batch=8)
  out_sep = {**is_only(FakeTrainer()), **fid_only(FakeTrainer())}
  assert gen_calls_both == 1  # the piggyback: ONE generate call total
  assert set(out_both) == set(out_sep)
  for k in out_sep:
    np.testing.assert_allclose(out_both[k], out_sep[k], rtol=1e-5,
                               err_msg=k)


def test_moments_match_numpy_cov():
  rng = np.random.default_rng(3)
  a = rng.standard_normal((128, 16)).astype(np.float32)
  mu, sig = metrics.moments_from_activations(jnp.asarray(a))
  np.testing.assert_allclose(np.asarray(mu), a.mean(0), atol=1e-5)
  np.testing.assert_allclose(np.asarray(sig), np.cov(a, rowvar=False),
                             atol=1e-4)


@pytest.mark.slow
def test_inception_v3_shapes():
  from wcgan_tpu.evaluation import inception_v3
  model, variables = inception_v3.init_params()
  x = jnp.zeros((2, 299, 299, 3), jnp.float32)
  pool, logits = model.apply(variables, x)
  assert pool.shape == (2, 2048)
  assert logits.shape == (2, 1000)


def test_preprocess():
  from wcgan_tpu.evaluation import inception_v3
  imgs = jnp.zeros((2, 32, 32, 1), jnp.uint8)
  x = inception_v3.preprocess(imgs)
  assert x.shape == (2, 299, 299, 3)
  np.testing.assert_allclose(np.asarray(x), -1.0)


@pytest.mark.slow
def test_scorer_mesh_sharded_activations():
  """Scoring batches shard across the mesh (distributed-FID path)."""
  import numpy as np
  from wcgan_tpu.data import get_dataset
  from wcgan_tpu.evaluation.scorer import make_scorer
  from wcgan_tpu.parallel import make_mesh

  ds = get_dataset("synthetic", batch_size=8, synthetic_size=64)
  mesh = make_mesh()
  scorer = make_scorer(ds, compute_is=True, compute_fid=True,
                       samples_inception=16, samples_fid=16, batch=8,
                       mesh=mesh)

  class FakeTrainer:
    gan_cfg = type("C", (), {"z_dim": 8, "conditional": False,
                             "num_classes": 0})()

    def generate(self, n, batch=256, rng_seed=0):
      rng = np.random.default_rng(rng_seed)
      return rng.integers(0, 256, (n, 32, 32, 3), dtype=np.uint8)

  out = scorer(FakeTrainer())
  assert "unverified_inception_score" in out
  assert "unverified_fid" in out
  assert all(np.isfinite(v) for v in out.values())


@pytest.mark.slow
def test_inception_weight_loader_contract(tmp_path):
  """load_npz_params consumes a torchvision-state_dict-format npz: build
  one synthetically from the flax structure (inverse key/layout mapping)
  and verify values land in the right places."""
  import flax
  from wcgan_tpu.evaluation import inception_v3

  _, variables = inception_v3.init_params()
  variables = flax.core.unfreeze(variables)
  rng = np.random.default_rng(0)
  sd = {}

  def walk(tree, path, kind):
    for k, v in tree.items():
      if isinstance(v, dict):
        walk(v, path + [k], kind)
        continue
      name = ".".join(path + [k])
      arr = rng.standard_normal(v.shape).astype(np.float32)
      if path and path[-1] == "conv" and k == "kernel":
        sd[".".join(path) + ".weight"] = arr.transpose(3, 2, 0, 1)
      elif path and path[-1] == "bn":
        key = {"scale": "weight", "bias": "bias"}.get(k)
        if kind == "stats":
          key = {"mean": "running_mean", "var": "running_var"}[k]
        sd[".".join(path) + "." + key] = arr
      elif path == ["fc"] and k == "kernel":
        sd["fc.weight"] = arr.T
      elif path == ["fc"] and k == "bias":
        sd["fc.bias"] = arr
      else:
        raise AssertionError(f"unmapped {name}")

  walk(variables["params"], [], "params")
  walk(variables["batch_stats"], [], "stats")
  # A REAL pretrained state_dict always carries AuxLogits + bookkeeping
  # keys; they must be skipped, not routed into the (AuxLogits-free)
  # flax tree by the conv/bn branches (evaluation review r3 crash).
  sd["AuxLogits.conv0.conv.weight"] = np.zeros((128, 768, 1, 1),
                                               np.float32)
  sd["AuxLogits.conv0.bn.weight"] = np.zeros((128,), np.float32)
  sd["AuxLogits.fc.weight"] = np.zeros((1000, 768), np.float32)
  sd["Conv2d_1a_3x3.bn.num_batches_tracked"] = np.zeros((), np.int64)
  path = str(tmp_path / "iv3.npz")
  np.savez(path, **sd)

  _, loaded = inception_v3.load_npz_params(path)
  # Spot-check every kind of mapping round-trips exactly.
  k = np.asarray(loaded["params"]["Conv2d_1a_3x3"]["conv"]["kernel"])
  np.testing.assert_array_equal(
      k, sd["Conv2d_1a_3x3.conv.weight"].transpose(2, 3, 1, 0))
  np.testing.assert_array_equal(
      np.asarray(loaded["batch_stats"]["Mixed_7c"]["branch_pool"]["bn"]
                 ["var"]),
      sd["Mixed_7c.branch_pool.bn.running_var"])
  np.testing.assert_array_equal(
      np.asarray(loaded["params"]["fc"]["kernel"]), sd["fc.weight"].T)

  # Completeness guard: an npz with a missing leaf must refuse to load
  # (a silently-random fc would score garbage while reporting verified —
  # SURVEY.md §7 hard-part #5).
  partial = {k: v for k, v in sd.items() if k != "fc.weight"}
  ppath = str(tmp_path / "iv3_partial.npz")
  np.savez(ppath, **partial)
  with pytest.raises(KeyError, match="unloaded"):
    inception_v3.load_npz_params(ppath)
