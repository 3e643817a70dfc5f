"""The fused train step: K discriminator updates + 1 generator update
compiled as ONE XLA program.

This is the TPU-native replacement for the reference's hot loop
(``gan/train.py::Trainer.train_one_epoch`` [U], SURVEY.md §3.1), where
every D/G update was a separate ``sess.run`` with host↔device transfers.
Here the whole outer step — ``training_ratio`` D updates (hinge/ns/wgan ±
GP ± AC aux), one G update on a ``generator_batch_multiple``-sized batch,
both Adams, SN power-iteration state, WC moving stats, LR schedules, and
z/label sampling — is a single jitted program; z is drawn on-device.

Data parallelism: ``make_sharded_step`` wraps the same function in
``shard_map`` over a 1-D ``data`` mesh; gradients and losses are
``pmean``-ed explicitly, and the WC layers' moment reduction rides the
same axis name (cross-replica covariance all-reduce,
BASELINE.json:"north_star").

Semantic notes vs the reference (documented divergences):
- During D updates the (frozen) G runs in train mode (batch-stat
  whitening, matching Keras learning_phase=1) but its moving stats are
  NOT advanced; stats advance only on the G update. [Keras would advance
  them on every forward; one advance per outer step is the cleaner
  semantics and is flagged here for the parity record.] The additive
  ``d_fake_stats='running'`` mode instead generates D-phase fakes with
  EVAL-mode G (running stats) — see ``GANConfig.d_fake_stats``.
- SN ``u`` vectors advance once per D update (real+fake scored in one
  concatenated forward when D has no norm), not once per Keras
  ``train_on_batch``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 moved shard_map out of experimental
  from jax import shard_map
except ImportError:  # pragma: no cover
  from jax.experimental.shard_map import shard_map

from wcgan_tpu.ops import losses as loss_ops
from wcgan_tpu.parallel.mesh import DATA_AXIS
from wcgan_tpu.train.state import GANTrainState


@dataclasses.dataclass(frozen=True)
class GANConfig:
  """Objective + update-schedule config (the reference's ``GAN`` /
  ``ProjectiveGAN`` / ``AC_GAN`` compile layer + Trainer knobs [U])."""

  loss: str = "hinge"                 # hinge | ns | wgan | wgan-gp
  gan_type: str = "gan"               # gan | projection | acgan
  training_ratio: int = 5             # --training_ratio [U]
  generator_batch_multiple: int = 2   # --generator_batch_multiple [U]
  gradient_penalty_weight: float = 0.0  # --gradient_penalty_weight [U]
  num_classes: int = 0
  z_dim: int = 128
  axis_name: Optional[str] = None
  sn_update_on_g_step: bool = False
  random_flip: bool = False           # on-device horizontal flip (the
                                      # reference flips on host [U])
  unroll_d_scan: bool = False         # unroll the K D-updates instead of
                                      # lax.scan-ing them (bigger program,
                                      # more cross-step scheduling freedom
                                      # for XLA; measured neutral on v5e —
                                      # see BASELINE.md attribution note)
  batched_fake_gen: bool = False      # generate ALL training_ratio fake
                                      # batches in ONE G forward before the
                                      # D scan instead of one B-sized
                                      # forward per D update. G's params
                                      # and stats are frozen across the
                                      # scan, so the only semantic delta
                                      # is the whitening moment batch
                                      # (ratio*B rows instead of B —
                                      # *better* statistics); bit-exact
                                      # for a stat-free G (tested).
                                      # Measured NEUTRAL on v5e at the
                                      # headline shape (33.9 vs 33.8 ms
                                      # interleaved A/B) — the b64 G
                                      # forward is already throughput-
                                      # bound, so 1x b320 costs the same
                                      # as 5x b64 and the per-forward NS
                                      # chain is too small to matter
                                      # (BASELINE.md r3 breakdown). Kept
                                      # as an option for its moment-
                                      # statistics benefit, default off.
  g_ema_decay: float = 0.0            # EMA of G params for sampling
                                      # (0 = off; not in the reference —
                                      # additive capability)
  d_fake_stats: str = "batch"         # whitening/BN stats source for the
                                      # D-phase fake generation forwards:
                                      # 'batch' (reference parity — each
                                      # of the K frozen-G forwards
                                      # recomputes batch moments + the
                                      # Newton-Schulz chain) or 'running'
                                      # (additive perf mode: D-phase
                                      # fakes come from EVAL-mode G, i.e.
                                      # running stats — the distribution
                                      # the deployed sampler actually
                                      # produces. G's params AND running
                                      # stats are then loop-invariant
                                      # across the D scan, so XLA's
                                      # while-loop ICM hoists the whole
                                      # moments+NS+fold chain out of the
                                      # K updates. The G update itself
                                      # keeps exact batch-stat semantics
                                      # and remains the only stats
                                      # advance per outer step, so the
                                      # EMA trajectory is unchanged.
                                      # Measured on-chip: +8.0% headline
                                      # / +13% conditional e2e, BUT the
                                      # 50k soak shows slowly degrading
                                      # covariance conditioning — see
                                      # BASELINE.md + docs/SOAK.md r4
                                      # before using on long runs.
                                      # Cold-start caveat (ADVICE r4): at
                                      # init the running stats are
                                      # (mean=0, cov=I), so early D-phase
                                      # fakes are effectively UN-whitened
                                      # until the EMA warms up (~1/(1-m)
                                      # outer steps: ~100 at the 0.99
                                      # default) — D briefly trains on a
                                      # distribution G's own update never
                                      # produces. Pair with
                                      # --wc_momentum 0.9 from step 0:
                                      # it shortens warm-up to ~10 steps
                                      # AND is the measured long-horizon
                                      # conditioning mitigation.)

  @property
  def conditional(self) -> bool:
    return self.num_classes > 0


def _pmean(tree, axis_name):
  if axis_name is None:
    return tree
  return lax.pmean(tree, axis_name)


def prepare_real(real: jax.Array, rng: jax.Array,
                 random_flip: bool) -> jax.Array:
  """On-device input pipeline tail: uint8 → [-1, 1] float32 (+ random
  horizontal flip). Keeping batches uint8 until here quarters host→device
  transfer bytes (BASELINE.json:"north_star": on-device decode/flip)."""
  if real.dtype == jnp.uint8:
    real = real.astype(jnp.float32) / 127.5 - 1.0
  if random_flip:
    # real: (..., B, H, W, C); flip W per sample.
    flip_shape = real.shape[:-3] + (1, 1, 1)
    flip = jax.random.bernoulli(rng, 0.5, flip_shape)
    real = jnp.where(flip, real[..., :, ::-1, :], real)
  return real


def _merge(state_dict, mut):
  """Overlay mutated collections onto the stored ones (plain dicts)."""
  out = dict(state_dict)
  out.update(flax.core.unfreeze(mut))
  return out


def make_outer_step(
    g_module,
    d_module,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    cfg: GANConfig,
) -> Callable[[GANTrainState, jax.Array, jax.Array],
              Tuple[GANTrainState, Dict[str, jax.Array]]]:
  """Build the fused outer-step function (not yet jitted/sharded).

  Args of the returned fn:
    state: GANTrainState.
    real: (training_ratio, B, H, W, C) real images in [-1, 1] — one
      B-batch per D update, supplied by the input pipeline.
    labels: (training_ratio, B) int32 labels (all-zeros if unconditional).
  Returns (new_state, metrics) with scalar d_loss / g_loss means.
  """
  d_loss_fn, g_loss_fn = loss_ops.get_losses(cfg.loss)
  axis = cfg.axis_name
  d_cfg = getattr(d_module, "cfg", None)
  # Only NORM codes carry batch-coupled statistics (whitening moments);
  # coloring is per-sample (no batch stats — ops/coloring.py), so a
  # coloring-only D keeps the concatenated real+fake hot path
  # (review r3: gating on coloring too split the forward needlessly).
  d_has_norm = d_cfg is not None and d_cfg.norm != "n"
  d_takes_labels = cfg.conditional and d_cfg is not None and (
      d_cfg.projection or d_cfg.ac_gan or d_cfg.num_classes > 0)

  if cfg.d_fake_stats not in ("batch", "running"):
    raise ValueError(f"d_fake_stats must be 'batch' or 'running', "
                     f"got {cfg.d_fake_stats!r}")
  # 'running': the D-phase fake forwards run EVAL-mode G (no mutable
  # collections are ever kept from them anyway — see d_update).
  d_fake_train = cfg.d_fake_stats == "batch"

  def g_apply(params, g_state, z, zy, want_mutable, train=True):
    variables = {"params": params, **g_state}
    mutable = list(g_state.keys()) if (want_mutable and train) else False
    if mutable:
      fake, mut = g_module.apply(variables, z, zy, train=True,
                                 mutable=mutable)
      return fake, mut
    return g_module.apply(variables, z, zy, train=train), {}

  def d_apply(params, d_state, x, y, update_sn):
    variables = {"params": params, **d_state}
    mutable = list(d_state.keys())
    if mutable:
      out, mut = d_module.apply(variables, x, y, train=True,
                                update_sn=update_sn, mutable=mutable)
      return out, mut
    return d_module.apply(variables, x, y, train=True,
                          update_sn=update_sn), {}

  def draw_fake_inputs(rng, b):
    """Per-D-update z/label draw — shared by the per-step and batched fake
    paths so their random streams are identical."""
    rng_z, rng_y, rng_gp = jax.random.split(rng, 3)
    z = jax.random.normal(rng_z, (b, cfg.z_dim), jnp.float32)
    zy = (jax.random.randint(rng_y, (b,), 0, cfg.num_classes, jnp.int32)
          if cfg.conditional else None)
    return z, zy, rng_gp

  def d_update(state: GANTrainState, x, y, rng, fake=None, zy=None):
    b = x.shape[0]
    z, zy_drawn, rng_gp = draw_fake_inputs(rng, b)
    if fake is None:
      zy = zy_drawn
      fake, _ = g_apply(state.g_params, state.g_state, z, zy,
                        want_mutable=bool(state.g_state),
                        train=d_fake_train)
    fake = lax.stop_gradient(fake)
    y_in = y if d_takes_labels else None
    zy_in = zy if d_takes_labels else None

    def loss_fn(d_params):
      if d_has_norm:
        # Whitening/BN inside D: keep real/fake batch statistics separate
        # (mixing them would change the norm semantics).
        (rs, rl), mut = d_apply(d_params, state.d_state, x, y_in,
                                update_sn=True)
        (fs, _), _ = d_apply(d_params, state.d_state, fake, zy_in,
                             update_sn=False)
      else:
        # Hot path: one concatenated forward — one SN power iteration,
        # bigger matmuls for the MXU.
        xx = jnp.concatenate([x, fake], axis=0)
        yy = (jnp.concatenate([y_in, zy_in], axis=0)
              if y_in is not None else None)
        (scores, logits), mut = d_apply(d_params, state.d_state, xx, yy,
                                        update_sn=True)
        rs, fs = scores[:b], scores[b:]
        rl = logits[:b] if logits is not None else None
      loss = d_loss_fn(rs, fs)
      if cfg.gradient_penalty_weight > 0.0:
        def score_only(xi):
          (s, _), _ = d_apply(d_params, state.d_state, xi, y_in,
                              update_sn=False)
          return s
        loss = loss + loss_ops.gradient_penalty(
            score_only, x, fake, rng_gp,
            weight=cfg.gradient_penalty_weight)
      if cfg.gan_type == "acgan" and rl is not None:
        # D's aux classifier trains on REAL logits only; the fake-sample
        # CE enters through the G update (g_update below). This mirrors
        # the reconstructed reference split — gan/ac_gan.py [U] "aux CE
        # on real (D) and fake (G)" (SURVEY.md §2a) — not the original
        # AC-GAN paper's both-sides D objective; a deliberate
        # reference-parity choice, re-verify if the mount returns.
        loss = loss + loss_ops.ac_gan_aux_loss(rl, y)
      return loss, mut

    (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.d_params)
    grads = _pmean(grads, axis)
    loss = _pmean(loss, axis)
    gnorm = optax.global_norm(grads)
    updates, d_opt = d_tx.update(grads, state.d_opt, state.d_params)
    d_params = optax.apply_updates(state.d_params, updates)
    state = state.replace(d_params=d_params, d_opt=d_opt,
                          d_state=_merge(state.d_state, mut))
    return state, (loss, gnorm)

  def g_update(state: GANTrainState, rng, g_batch):
    rng_z, rng_y = jax.random.split(rng)
    z = jax.random.normal(rng_z, (g_batch, cfg.z_dim), jnp.float32)
    zy = (jax.random.randint(rng_y, (g_batch,), 0, cfg.num_classes,
                             jnp.int32) if cfg.conditional else None)
    zy_in = zy if d_takes_labels else None

    def loss_fn(g_params):
      fake, mut = g_apply(g_params, state.g_state, z, zy,
                          want_mutable=bool(state.g_state))
      (fs, fl), d_mut = d_apply(state.d_params, state.d_state, fake, zy_in,
                                update_sn=cfg.sn_update_on_g_step)
      loss = g_loss_fn(fs)
      if cfg.gan_type == "acgan" and fl is not None:
        loss = loss + loss_ops.ac_gan_aux_loss(fl, zy)
      return loss, (mut, d_mut)

    (loss, (mut, d_mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.g_params)
    grads = _pmean(grads, axis)
    loss = _pmean(loss, axis)
    gnorm = optax.global_norm(grads)
    updates, g_opt = g_tx.update(grads, state.g_opt, state.g_params)
    g_params = optax.apply_updates(state.g_params, updates)
    g_ema = state.g_ema
    if cfg.g_ema_decay > 0.0 and g_ema:
      d_ = cfg.g_ema_decay
      g_ema = jax.tree_util.tree_map(
          lambda e, p: d_ * e + (1.0 - d_) * p, g_ema, g_params)
    d_state = state.d_state
    if cfg.sn_update_on_g_step and "spectral" in d_mut:
      # Advance ONLY the SN power-iteration vectors; D's norm statistics
      # stay fixed on the G step (the documented stats semantics above).
      d_state = _merge(d_state, {"spectral": d_mut["spectral"]})
    return state.replace(g_params=g_params, g_opt=g_opt, g_ema=g_ema,
                         g_state=_merge(state.g_state, mut),
                         d_state=d_state), (loss, gnorm)

  def outer_step(state: GANTrainState, real: jax.Array,
                 labels: jax.Array
                 ) -> Tuple[GANTrainState, Dict[str, jax.Array]]:
    ratio, b = real.shape[0], real.shape[1]
    if ratio != cfg.training_ratio:
      raise ValueError(f"got {ratio} D batches, expected "
                       f"training_ratio={cfg.training_ratio}")
    next_rng, use_rng = jax.random.split(state.rng)
    if axis is not None:
      # Per-replica divergence for z/label draws; state.rng stays
      # replicated (next_rng derives from the replicated base only).
      use_rng = jax.random.fold_in(use_rng, lax.axis_index(axis))
    real = prepare_real(real, jax.random.fold_in(use_rng, ratio + 1),
                        cfg.random_flip)

    if cfg.batched_fake_gen:
      # One G forward for ALL ratio fake batches. Reuses the per-k rng
      # streams of the unbatched path, so a stat-free G produces the
      # identical fake tensors (regression-tested); a WC G sees its
      # whitening moments over ratio*B rows instead of B.
      zs, zys = [], []
      for k in range(ratio):
        z_k, zy_k, _ = draw_fake_inputs(jax.random.fold_in(use_rng, k), b)
        zs.append(z_k)
        zys.append(zy_k)
      z_all = jnp.concatenate(zs, axis=0)
      zy_all = jnp.concatenate(zys, axis=0) if cfg.conditional else None
      fake_all, _ = g_apply(state.g_params, state.g_state, z_all, zy_all,
                            want_mutable=bool(state.g_state),
                            train=d_fake_train)
      fakes = lax.stop_gradient(fake_all).reshape(
          (ratio, b) + fake_all.shape[1:])
      zy_scan = (zy_all.reshape(ratio, b) if cfg.conditional
                 else jnp.zeros((ratio, b), jnp.int32))

      def d_scan_body(carry, xs):
        x, y, k, fk, fzy = xs
        carry, loss = d_update(
            carry, x, y, jax.random.fold_in(use_rng, k), fake=fk,
            zy=fzy if cfg.conditional else None)
        return carry, loss

      scan_xs = (real, labels, jnp.arange(ratio, dtype=jnp.int32),
                 fakes, zy_scan)
    else:
      def d_scan_body(carry, xs):
        x, y, k = xs
        carry, loss = d_update(carry, x, y,
                               jax.random.fold_in(use_rng, k))
        return carry, loss

      scan_xs = (real, labels, jnp.arange(ratio, dtype=jnp.int32))

    state, (d_losses, d_gnorms) = lax.scan(
        d_scan_body, state, scan_xs,
        unroll=(max(ratio, 1) if cfg.unroll_d_scan else 1))

    state, (g_loss, g_gnorm) = g_update(
        state, jax.random.fold_in(use_rng, ratio),
        b * cfg.generator_batch_multiple)
    state = state.replace(rng=next_rng, step=state.step + 1)
    metrics = {"d_loss": jnp.mean(d_losses), "g_loss": g_loss,
               "d_grad_norm": jnp.mean(d_gnorms), "g_grad_norm": g_gnorm}
    return state, metrics

  return outer_step


def make_dataset_step(g_module, d_module, g_tx, d_tx, cfg: GANConfig,
                      batch_size: int):
  """Outer step over a DEVICE-RESIDENT dataset.

  The reference feeds every update from host numpy (SURVEY.md §3.1); even
  this framework's fused step still paid one host->device batch upload
  per outer step — measured ~3x throughput loss through this box's TPU
  tunnel (9.2k imgs/s device-fed vs 3.2k host-fed). CIFAR-scale datasets
  fit in HBM (CIFAR-10: 150 MB uint8), so the TPU-native pipeline uploads
  the whole dataset ONCE and samples minibatch indices on-device inside
  the jitted step (uniform with replacement — the reference's
  epoch-shuffle semantics replaced by i.i.d. sampling; statistically
  equivalent for GAN training and noted here for the parity record).

  Returned fn: (state, data_x (N,H,W,C), data_y (N,)) -> (state, metrics).
  Under data parallelism, shard data_x/data_y along the 'data' axis:
  each replica samples from its local shard.
  """
  inner = make_outer_step(g_module, d_module, g_tx, d_tx, cfg)
  ratio = cfg.training_ratio

  def step(state: GANTrainState, data_x: jax.Array, data_y: jax.Array):
    pick_rng = jax.random.fold_in(state.rng, 0x5A11CE)
    if cfg.axis_name is not None:
      pick_rng = jax.random.fold_in(pick_rng,
                                    lax.axis_index(cfg.axis_name))
    idx = jax.random.randint(pick_rng, (ratio * batch_size,), 0,
                             data_x.shape[0])
    real = jnp.take(data_x, idx, axis=0).reshape(
        (ratio, batch_size) + data_x.shape[1:])
    labels = jnp.take(data_y, idx, axis=0).reshape(ratio, batch_size)
    return inner(state, real, labels)

  return step


def _multi(fn, steps_per_call: int):
  """Chain several outer steps into one traced program (one host
  dispatch). Per-dispatch RPC overhead through this box's TPU tunnel is
  ~25 ms — chaining amortizes it (requires device-resident data: no
  per-step host inputs). Metrics are averaged over the chain."""
  if steps_per_call <= 1:
    return fn

  def multi(state, data_x, data_y):
    def body(st, _):
      st, metrics = fn(st, data_x, data_y)
      return st, metrics
    state, metrics = lax.scan(body, state, None, length=steps_per_call)
    return state, jax.tree_util.tree_map(jnp.mean, metrics)

  return multi


def make_jit_dataset_step(g_module, d_module, g_tx, d_tx, cfg: GANConfig,
                          batch_size: int, donate: bool = True,
                          steps_per_call: int = 1):
  """Single-device jitted device-resident-data step."""
  fn = make_dataset_step(g_module, d_module, g_tx, d_tx,
                         dataclasses.replace(cfg, axis_name=None),
                         batch_size)
  return jax.jit(_multi(fn, steps_per_call),
                 donate_argnums=(0,) if donate else ())


def make_sharded_dataset_step(mesh: Mesh, g_module, d_module, g_tx, d_tx,
                              cfg: GANConfig, batch_size: int,
                              donate: bool = True,
                              steps_per_call: int = 1):
  """Data-parallel device-resident-data step: the dataset is sharded
  across the mesh; each replica samples its local shard (per-replica
  batch = batch_size / n_devices)."""
  cfg = dataclasses.replace(cfg, axis_name=DATA_AXIS)
  n_dev = mesh.devices.size
  if batch_size % n_dev:
    raise ValueError(f"batch_size {batch_size} must be divisible by the "
                     f"mesh size {n_dev}")
  local_batch = batch_size // n_dev
  fn = make_dataset_step(g_module, d_module, g_tx, d_tx, cfg, local_batch)
  sharded = shard_map(
      _multi(fn, steps_per_call), mesh=mesh,
      in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
      out_specs=(P(), P()))
  return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_jit_step(g_module, d_module, g_tx, d_tx, cfg: GANConfig,
                  donate: bool = True):
  """Single-device jitted outer step."""
  fn = make_outer_step(g_module, d_module, g_tx, d_tx,
                       dataclasses.replace(cfg, axis_name=None))
  return jax.jit(fn, donate_argnums=(0,) if donate else ())


def make_sharded_step(mesh: Mesh, g_module, d_module, g_tx, d_tx,
                      cfg: GANConfig, donate: bool = True):
  """Data-parallel outer step over ``mesh``: batch sharded on the 'data'
  axis, state replicated; grads/losses pmean-ed inside; the WC layers'
  moment psum rides the same axis (set the models' ``axis_name``!)."""
  cfg = dataclasses.replace(cfg, axis_name=DATA_AXIS)
  fn = make_outer_step(g_module, d_module, g_tx, d_tx, cfg)
  sharded = shard_map(
      fn, mesh=mesh,
      in_specs=(P(), P(None, DATA_AXIS), P(None, DATA_AXIS)),
      out_specs=(P(), P()))
  jitted = jax.jit(sharded, donate_argnums=(0,) if donate else ())
  n_dev = mesh.devices.size

  def checked(state, real, labels):
    # Same actionable error make_sharded_dataset_step raises at build
    # time; without it an indivisible host-fed batch surfaces as an
    # opaque low-level shard_map sharding failure.
    if real.shape[1] % n_dev:
      raise ValueError(f"batch_size {real.shape[1]} must be divisible "
                       f"by the mesh size {n_dev}")
    return jitted(state, real, labels)

  return checked
