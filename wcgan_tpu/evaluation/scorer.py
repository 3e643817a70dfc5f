"""Score orchestration: sample G, run the feature net, compute IS/FID.

Rebuilds ``scorer.py``'s callback role [U] (SURVEY.md §3.4): every N
epochs the Trainer calls this with itself; we generate images in
minibatches, push them through InceptionV3 on-device, and return
{'inception_score', 'is_std', 'fid'} for the log.

No-egress note: real Inception weights must be supplied via
``inception_weights`` (npz; see inception_v3.load_npz_params docstring).
Without them the pipeline runs with random weights and the returned keys
are prefixed ``unverified_`` so a meaningless score can never be mistaken
for a real one (SURVEY.md §7 hard-part #5: never silently substitute).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wcgan_tpu.evaluation import inception_v3, metrics


def _activations(apply_fn, images_u8: np.ndarray, batch: int):
  pools, probs = [], []
  n = images_u8.shape[0]
  for i in range(0, n, batch):
    chunk = images_u8[i:i + batch]
    if chunk.shape[0] < batch:  # pad to static shape, mask after
      real_n = chunk.shape[0]
      pad = batch - real_n
      chunk = np.concatenate(
          [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
      pool, prob = apply_fn(jnp.asarray(chunk))
      pools.append(np.asarray(pool)[:real_n])
      probs.append(np.asarray(prob)[:real_n])
    else:
      pool, prob = apply_fn(jnp.asarray(chunk))
      pools.append(np.asarray(pool))
      probs.append(np.asarray(prob))
  return np.concatenate(pools), np.concatenate(probs)


def make_scorer(dataset, compute_is: bool = True, compute_fid: bool = True,
                samples_inception: int = 50000, samples_fid: int = 10000,
                inception_weights: Optional[str] = None,
                batch: int = 100,
                mesh=None) -> Callable[..., Dict[str, float]]:
  """Build the Trainer scorer callback.

  With ``mesh``, scoring batches are sharded across the data axis —
  each chip runs the Inception forward on its shard (eval-mode BN has no
  cross-sample ops, so batch-parallel is exact); activations gather on
  fetch (SURVEY.md §5 distributed-FID row)."""
  cache = {}

  def get_net():
    if "apply" not in cache:
      if inception_weights:
        model, variables = inception_v3.load_npz_params(inception_weights)
        cache["verified"] = True
      else:
        model, variables = inception_v3.init_params()
        cache["verified"] = False

      shard = None
      if mesh is not None:
        from wcgan_tpu.parallel.mesh import data_sharding
        shard = data_sharding(mesh)

      @jax.jit
      def apply_fn(images_u8):
        if shard is not None:
          images_u8 = jax.lax.with_sharding_constraint(images_u8, shard)
        x = inception_v3.preprocess(images_u8)
        pool, logits = model.apply(variables, x)
        return pool, jax.nn.softmax(logits, axis=-1)

      cache["apply"] = apply_fn
    return cache["apply"], cache["verified"]

  def scorer(trainer) -> Dict[str, float]:
    apply_fn, verified = get_net()
    out: Dict[str, float] = {}

    if compute_is:
      imgs = trainer.generate(samples_inception)
      _, probs = _activations(apply_fn, imgs, batch)
      mean, std = metrics.inception_score(jnp.asarray(probs))
      out["inception_score"] = float(mean)
      out["is_std"] = float(std)

    if compute_fid:
      if "real_moments" not in cache:
        real = dataset.real_sample(samples_fid)
        pool_r, _ = _activations(apply_fn, real, batch)
        cache["real_moments"] = metrics.moments_from_activations(
            jnp.asarray(pool_r))
      fake = trainer.generate(samples_fid)
      pool_f, _ = _activations(apply_fn, fake, batch)
      mu_f, sig_f = metrics.moments_from_activations(jnp.asarray(pool_f))
      mu_r, sig_r = cache["real_moments"]
      out["fid"] = metrics.fid_from_moments(mu_r, sig_r, mu_f, sig_f)

    if not verified:
      out = {f"unverified_{k}": v for k, v in out.items()}
    return out

  return scorer
