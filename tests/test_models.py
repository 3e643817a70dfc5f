"""Model-level tests: shapes, state collections, conditioning, SN gating."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wcgan_tpu.models.discriminator import Discriminator, DiscriminatorConfig
from wcgan_tpu.models.generator import Generator, GeneratorConfig

KEY = jax.random.PRNGKey(0)


def tiny_gcfg(**kw):
  base = dict(z_dim=16, resolution=16, base_resolution=4, filters=(16, 16),
              ns_iters=8)
  base.update(kw)
  return GeneratorConfig(**base)


def tiny_dcfg(**kw):
  base = dict(resolution=16, filters=(16, 16, 16),
              downsample=(True, True, False))
  base.update(kw)
  return DiscriminatorConfig(**base)


@pytest.mark.parametrize("arch", ["res", "dcgan"])
def test_generator_output_shape_and_range(arch):
  g = Generator(cfg=tiny_gcfg(arch=arch))
  z = jax.random.normal(KEY, (4, 16))
  variables = g.init(KEY, z, train=True)
  out, _ = g.apply(variables, z, train=True, mutable=["wc_stats"])
  assert out.shape == (4, 16, 16, 3)
  assert np.isfinite(np.asarray(out)).all()
  assert np.abs(np.asarray(out)).max() <= 1.0  # tanh range


@pytest.mark.parametrize("arch", ["res", "dcgan"])
@pytest.mark.parametrize("spectral", [True, False])
def test_discriminator_shapes(arch, spectral):
  dcfg = (tiny_dcfg(arch=arch, spectral=spectral) if arch == "res"
          else tiny_dcfg(arch=arch, spectral=spectral, filters=(16, 16),
                         downsample=(True, True)))
  d = Discriminator(cfg=dcfg)
  x = jax.random.normal(KEY, (4, 16, 16, 3))
  variables = d.init(KEY, x, train=True)
  (score, logits), _ = d.apply(variables, x, train=True,
                               mutable=["spectral"])
  assert score.shape == (4,)
  assert logits is None


@pytest.mark.parametrize("coloring", ["cconv", "ucconv", "cconv-sa",
                                      "ucconv-sa", "ccs", "ucs"])
def test_conditional_generator_labels_matter(coloring):
  g = Generator(cfg=tiny_gcfg(block_coloring=coloring,
                              last_coloring="uconv", num_classes=4))
  z = jax.random.normal(KEY, (4, 16))
  y0 = jnp.zeros((4,), jnp.int32)
  y1 = jnp.ones((4,), jnp.int32)
  variables = g.init(KEY, z, y0, train=True)

  # Class params init identically across classes (or near-zero), so fresh
  # classes can coincide; give each class a distinct offset on every
  # class-indexed parameter (leading dim == num_classes) only.
  def perturb(p):
    if p.ndim >= 1 and p.shape[0] == 4:
      shift = jnp.arange(4, dtype=p.dtype).reshape((4,) + (1,) * (p.ndim - 1))
      return p + 0.3 * shift
    return p
  variables = jax.tree_util.tree_map(perturb, variables)
  out0, _ = g.apply(variables, z, y0, train=True, mutable=["wc_stats"])
  out1, _ = g.apply(variables, z, y1, train=True, mutable=["wc_stats"])
  assert not np.allclose(np.asarray(out0), np.asarray(out1))


def test_projection_discriminator_uses_labels():
  d = Discriminator(cfg=tiny_dcfg(projection=True, num_classes=4))
  x = jax.random.normal(KEY, (4, 16, 16, 3))
  y0 = jnp.zeros((4,), jnp.int32)
  y1 = jnp.ones((4,), jnp.int32)
  variables = d.init(KEY, x, y0, train=True)
  (s0, _), _ = d.apply(variables, x, y0, train=True, mutable=["spectral"])
  (s1, _), _ = d.apply(variables, x, y1, train=True, mutable=["spectral"])
  assert not np.allclose(np.asarray(s0), np.asarray(s1))


def test_ac_gan_head():
  d = Discriminator(cfg=tiny_dcfg(ac_gan=True, num_classes=4))
  x = jax.random.normal(KEY, (4, 16, 16, 3))
  variables = d.init(KEY, x, train=True)
  (_, logits), _ = d.apply(variables, x, train=True, mutable=["spectral"])
  assert logits.shape == (4, 4)


def test_sn_u_update_gated():
  d = Discriminator(cfg=tiny_dcfg())
  x = jax.random.normal(KEY, (4, 16, 16, 3))
  variables = d.init(KEY, x, train=True)
  u0 = variables["spectral"]["fc_out"]["u"]
  _, mut = d.apply(variables, x, train=True, update_sn=False,
                   mutable=["spectral"])
  assert np.allclose(np.asarray(mut["spectral"]["fc_out"]["u"]),
                     np.asarray(u0))
  _, mut = d.apply(variables, x, train=True, update_sn=True,
                   mutable=["spectral"])
  assert not np.allclose(np.asarray(mut["spectral"]["fc_out"]["u"]),
                         np.asarray(u0))


def test_wc_stats_update_and_eval_path():
  g = Generator(cfg=tiny_gcfg())
  z = jax.random.normal(KEY, (16, 16))
  variables = g.init(KEY, z, train=True)
  stats0 = variables["wc_stats"]
  out, mut = g.apply(variables, z, train=True, mutable=["wc_stats"])
  leaf0 = jax.tree_util.tree_leaves(stats0)[0]
  leaf1 = jax.tree_util.tree_leaves(mut["wc_stats"])[0]
  assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))
  # Eval mode: no mutation needed, deterministic output.
  out_eval = g.apply(variables, z, train=False)
  out_eval2 = g.apply(variables, z, train=False)
  np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(out_eval2))


def test_wc_momentum_plumbs_to_ema_semantics():
  """--wc_momentum must reach every WC layer: after one train forward
  from the (zeros, I) init, new_mean = m*0 + (1-m)*batch_mean — so the
  running-mean leaves scale linearly in (1-m) between two momenta."""
  z = jax.random.normal(KEY, (32, 16))

  def first_update_means(m):
    g = Generator(cfg=tiny_gcfg(wc_momentum=m))
    variables = g.init(KEY, z, train=True)
    _, mut = g.apply(variables, z, train=True, mutable=["wc_stats"])
    leaves = jax.tree_util.tree_leaves_with_path(mut["wc_stats"])
    return [np.asarray(v) for p, v in
            sorted(leaves, key=lambda pv: jax.tree_util.keystr(pv[0]))
            if p[-1].key == "mean"]

  means_99 = first_update_means(0.99)
  means_90 = first_update_means(0.9)
  assert means_99 and len(means_99) == len(means_90)
  for a, b in zip(means_99, means_90):
    # Same batch_mean (same init seed/inputs): b = 10*a exactly in the
    # EMA formula; allow f32 rounding.
    np.testing.assert_allclose(b, 10.0 * a, rtol=1e-4)


def test_ns_scaling_plumbs_to_every_wc_layer():
  """--ns_scaling must reach the layers: at a deliberately
  under-converged iteration count (ns_iters=2) the 'trace' and 'fro'
  normalizations produce visibly different whitening transforms, so the
  generator outputs must differ — if the flag were dropped anywhere the
  two forwards would be bit-identical. Both must stay finite."""
  z = jax.random.normal(KEY, (32, 16))

  def fwd(scaling):
    g = Generator(cfg=tiny_gcfg(ns_iters=2, ns_scaling=scaling))
    variables = g.init(KEY, z, train=True)
    out, _ = g.apply(variables, z, train=True, mutable=["wc_stats"])
    return np.asarray(out)

  out_tr, out_fro = fwd("trace"), fwd("fro")
  assert np.isfinite(out_tr).all() and np.isfinite(out_fro).all()
  assert np.max(np.abs(out_tr - out_fro)) > 1e-4


def test_generator_grads_flow():
  g = Generator(cfg=tiny_gcfg())
  z = jax.random.normal(KEY, (8, 16))
  variables = g.init(KEY, z, train=True)
  params = variables["params"]

  def loss(params):
    out, _ = g.apply({"params": params}, z, train=True,
                     mutable=["wc_stats"])
    return jnp.mean(out ** 2)

  grads = jax.grad(loss)(params)
  flat = jax.tree_util.tree_leaves(grads)
  assert all(np.isfinite(np.asarray(x)).all() for x in flat)
  # Every parameter gets signal (no dead branches).
  nonzero = [float(jnp.max(jnp.abs(x))) > 0 for x in flat]
  assert all(nonzero), f"dead grads: {sum(not n for n in nonzero)} leaves"


def test_fused_wc_uconv_matches_composition():
  """The folded (Gamma W) fast path == whiten-then-color composition."""
  import numpy as np
  from wcgan_tpu.models import layers as L
  from wcgan_tpu.ops import coloring as cops
  from wcgan_tpu.ops import whiten as wops

  rng = np.random.default_rng(0)
  x = jnp.asarray(rng.standard_normal((4, 4, 4, 12)).astype(np.float32))
  nc = L.NormColor(norm="d", coloring="uconv", ns_iters=12)
  variables = nc.init(KEY, x, train=True)
  # Perturb gamma/beta away from identity/zero.
  gamma = jnp.asarray(rng.standard_normal((12, 12)).astype(np.float32))
  beta = jnp.asarray(rng.standard_normal((12,)).astype(np.float32))
  variables = {"params": {"gamma": gamma, "beta": beta},
               "wc_stats": variables["wc_stats"]}
  out, _ = nc.apply(variables, x, train=True, mutable=["wc_stats"])

  x2d = x.reshape(-1, 12)
  xh, _, _ = wops.whiten_train(x2d, jnp.zeros(12), jnp.eye(12),
                               num_iters=12)
  ref = cops.color_uncond(xh, gamma, beta).reshape(x.shape)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_pallas_eval_forced_with_cholesky_raises():
  """pallas_eval=True is a FORCED mode; with method='cholesky' (no
  Cholesky phase in the kernel) it must raise instead of silently
  measuring the split path as 'fused' (core review r3)."""
  import numpy as np
  import pytest
  from wcgan_tpu.models import layers as L
  x = jnp.asarray(np.zeros((4, 2, 2, 8), np.float32))
  nc = L.NormColor(norm="d", coloring="uconv", method="cholesky",
                   pallas_eval=True)
  variables = nc.init(KEY, x, train=True)
  with pytest.raises(ValueError, match="newton_schulz"):
    nc.apply(variables, x, train=False)


def test_fused_wc_uconv_eval_uses_running_stats():
  from wcgan_tpu.models import layers as L
  import numpy as np
  rng = np.random.default_rng(1)
  x = jnp.asarray(rng.standard_normal((8, 2, 2, 8)).astype(np.float32))
  nc = L.NormColor(norm="d", coloring="uconv", ns_iters=10)
  variables = nc.init(KEY, x, train=True)
  # Train once to move stats; eval output must be deterministic and use
  # the running stats (identity-ish at init).
  _, mut = nc.apply(variables, x, train=True, mutable=["wc_stats"])
  variables = {"params": variables["params"], **mut}
  e1 = nc.apply(variables, x, train=False)
  e2 = nc.apply(variables, x, train=False)
  np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


@pytest.mark.parametrize("norm,coloring", [("b", "s"), ("dr", "uconv"),
                                           ("n", "s"), ("b", "uconv"),
                                           ("dr", "cconv")])
def test_norm_coloring_code_matrix(norm, coloring):
  g = Generator(cfg=tiny_gcfg(block_norm=norm, block_coloring=coloring,
                              last_norm=norm, last_coloring="s",
                              num_classes=4 if "c" in coloring else 0))
  z = jax.random.normal(KEY, (4, 16))
  y = jnp.zeros((4,), jnp.int32) if "c" in coloring else None
  variables = g.init(KEY, z, y, train=True)
  mutable = [k for k in variables if k != "params"]
  out, _ = g.apply(variables, z, y, train=True, mutable=mutable)
  assert np.isfinite(np.asarray(out)).all()


def test_generator_concat_cls():
  g = Generator(cfg=tiny_gcfg(num_classes=4, concat_cls=True))
  z = jax.random.normal(KEY, (4, 16))
  y0, y1 = jnp.zeros((4,), jnp.int32), jnp.ones((4,), jnp.int32)
  variables = g.init(KEY, z, y0, train=True)
  o0, _ = g.apply(variables, z, y0, train=True, mutable=["wc_stats"])
  o1, _ = g.apply(variables, z, y1, train=True, mutable=["wc_stats"])
  assert not np.allclose(np.asarray(o0), np.asarray(o1))


def test_conv_singular_discriminator():
  d = Discriminator(cfg=tiny_dcfg(conv_singular=True))
  x = jax.random.normal(KEY, (4, 16, 16, 3))
  variables = d.init(KEY, x, train=True)
  (s, _), mut = d.apply(variables, x, train=True, update_sn=True,
                        mutable=["spectral"])
  assert np.isfinite(np.asarray(s)).all()
  # conv_singular uses input-shaped persistent maps
  any_map = any("u_map" in str(jax.tree_util.tree_structure(
      mut["spectral"])) for _ in [0])
  assert any_map


def test_remat_matches_no_remat():
  g0 = Generator(cfg=tiny_gcfg())
  g1 = Generator(cfg=tiny_gcfg(remat=True))
  z = jax.random.normal(KEY, (4, 16))
  v = g0.init(KEY, z, train=True)

  def loss(g, params):
    out, _ = g.apply({"params": params, "wc_stats": v["wc_stats"]}, z,
                     train=True, mutable=["wc_stats"])
    return jnp.sum(out ** 2)

  l0, grad0 = jax.value_and_grad(lambda p: loss(g0, p))(v["params"])
  l1, grad1 = jax.value_and_grad(lambda p: loss(g1, p))(v["params"])
  np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
  for a, b in zip(jax.tree_util.tree_leaves(grad0),
                  jax.tree_util.tree_leaves(grad1)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("code", ["cconv", "ucconv", "cconv-sa",
                                  "ucconv-sa"])
@pytest.mark.parametrize("hw", [2, 4])  # S=4 < C (two-pass) / S=16 >= C (fold)
def test_fused_wc_cond_matches_composition(code, hw):
  """The per-image (G_i W) folded conditional path == whiten-then-color
  composition (NormLayer + Coloring semantics), every conditional conv
  code, both the fold (S >= C) and two-pass (S < C) branches."""
  import numpy as np
  from wcgan_tpu.models import layers as L
  from wcgan_tpu.ops import coloring as cops
  from wcgan_tpu.ops import whiten as wops

  rng = np.random.default_rng(0)
  n, c, k, ncls = 6, 12, 3, 5
  x = jnp.asarray(rng.standard_normal((n, hw, hw, c)).astype(np.float32))
  y = jnp.asarray(rng.integers(0, ncls, n).astype(np.int32))
  nc = L.NormColor(norm="d", coloring=code, num_classes=ncls,
                   filters_emb=k, ns_iters=12)
  variables = nc.init(KEY, x, y, train=True)
  params = dict(variables["params"])
  # Perturb every learned tensor away from its init.
  for name in params:
    params[name] = jnp.asarray(
        rng.standard_normal(params[name].shape).astype(np.float32) * 0.3)
  variables = {"params": params, "wc_stats": variables["wc_stats"]}
  out, _ = nc.apply(variables, x, y, train=True, mutable=["wc_stats"])

  xh, _, _ = wops.whiten_train(x.reshape(-1, c), jnp.zeros(c),
                               jnp.eye(c), num_iters=12)
  x3d = xh.reshape(n, -1, c)
  agn = (params.get("gamma_a"), params.get("beta_a"))
  if code in ("cconv", "ucconv"):
    ref = cops.color_cond(x3d, y, params["gamma_c"], params["beta_c"],
                          *((agn) if code == "ucconv" else (None, None)))
  else:
    ref = cops.color_cond_sa(x3d, y, params["basis"],
                             params["embedding"], params["beta_c"],
                             *((agn) if code == "ucconv-sa"
                               else (None, None)))
  if code in ("cconv", "cconv-sa"):
    ref = ref + x3d  # identity skip of the pure-conditional codes
  np.testing.assert_allclose(np.asarray(out),
                             np.asarray(ref.reshape(x.shape)), atol=3e-4)


def test_gen_resblock_equal_width_upsample_has_learned_shortcut():
  """SN-GAN convention: the 1x1 shortcut conv exists whenever a res G
  block upsamples, even at equal widths (the headline CIFAR config is
  equal-width throughout; late-r3 parity fix)."""
  g = Generator(cfg=tiny_gcfg(arch="res"))          # 16 -> 16 widths
  z = jax.random.normal(KEY, (2, 16))
  params = g.init(KEY, z, train=True)["params"]
  for blk in ("block0", "block1"):
    assert "conv_sc" in params[blk], f"{blk} missing learned shortcut"


def test_discriminator_config_rejects_unsupported_combinations():
  # dcgan D has no norm/coloring insertion points.
  for kw in ({"norm": "d"}, {"coloring": "uconv"}):
    with pytest.raises(ValueError, match="dcgan"):
      tiny_dcfg(arch="dcgan", filters=(16, 16), downsample=(True, True),
                **kw)
  # remat stays ACCEPTED for dcgan (numerics-neutral no-op; the CLI
  # shares one --remat flag with the generator — review r3).
  tiny_dcfg(arch="dcgan", filters=(16, 16), downsample=(True, True),
            remat=True)
  # block 0 of the res D is the optimized block; it always downsamples.
  with pytest.raises(ValueError, match="downsample"):
    tiny_dcfg(downsample=(False, True, False))


def test_ns_method_reaches_discriminator_whitening():
  """--whitening_method must reach the D's NormColor: at ns_iters=1 the
  (under-converged) Newton-Schulz output measurably differs from the
  Cholesky oracle; identical outputs would mean the knob is dropped."""
  x = jax.random.normal(KEY, (4, 16, 16, 3))
  outs = {}
  for method in ("newton_schulz", "cholesky"):
    d = Discriminator(cfg=tiny_dcfg(norm="d", coloring="uconv",
                                    ns_iters=1, ns_method=method))
    variables = d.init(KEY, x, train=True)
    (score, _), _ = d.apply(variables, x, train=True,
                            mutable=["spectral", "wc_stats"])
    outs[method] = np.asarray(score)
  assert not np.allclose(outs["newton_schulz"], outs["cholesky"],
                         atol=1e-6)


def test_lowered_conv_op_counts_match_architecture():
  """Structural drift guard at the compiled-graph level: count the
  convolution ops in the lowered HLO of the headline-architecture G/D
  forwards. Parameter-tree tests pin what EXISTS; this pins what actually
  RUNS — the class of bug where a branch silently skips a layer (the
  late-r3 generator-shortcut parity bug would read 7 here, not 10).
  Derivations, so the pins aren't magic:
    G (res, 3 equal-width up blocks): 3 blocks x (conv1 + conv2 +
      conv_sc on every upsampling block) + conv_out           = 10
    D (res SN, filters x4, down on first two): optimized first block
      (conv1+conv2+conv_sc) + block2 (conv1+conv2+conv_sc, downsample)
      + 2 x (conv1+conv2, no resample/width change)           = 10
  """
  g = Generator(cfg=GeneratorConfig(z_dim=8, resolution=32,
                                    base_resolution=4, filters=(8, 8, 8),
                                    ns_iters=4))
  z = jax.random.normal(KEY, (2, 8))
  gv = g.init(KEY, z, train=True)
  g_txt = jax.jit(
      lambda v, z: g.apply(v, z, train=True, mutable=["wc_stats"])
  ).lower(gv, z).as_text()
  assert g_txt.count("stablehlo.convolution") == 10

  d = Discriminator(cfg=DiscriminatorConfig(
      resolution=32, filters=(8, 8, 8, 8),
      downsample=(True, True, False, False)))
  x = jnp.zeros((2, 32, 32, 3), jnp.float32)
  dv = d.init(KEY, x, train=True)
  d_txt = jax.jit(
      lambda v, x: d.apply(v, x, train=True, mutable=["spectral"])
  ).lower(dv, x).as_text()
  assert d_txt.count("stablehlo.convolution") == 10
