"""InceptionV3 (torchvision layout) in flax — the FID/IS feature network.

The reference evaluates with the 2015 TF-Slim inception .pb downloaded at
run time (``gan/inception_score.py`` [U]); this box has no egress, so the
network is reimplemented natively (NHWC, fused BN in eval mode) and
weights load from a local ``.npz`` of a torchvision
``inception_v3`` ``state_dict`` (see ``convert_torchvision_npz`` below
for the exact key/layout contract — run it wherever torchvision weights
are available, ship the npz).

Without weights the module still runs (random init) so the full scoring
pipeline is exercisable — scores are then meaningless; the scorer makes
that explicit rather than silently substituting (SURVEY.md §7 hard-part
#5).

Outputs: (pool, logits) = (2048-d pre-fc features, 1000-way logits) —
pool feeds FID, softmax(logits) feeds IS.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicConv(nn.Module):
  """Conv (no bias) + folded BatchNorm (eval, eps 1e-3) + ReLU."""

  features: int
  kernel: Tuple[int, int]
  strides: Tuple[int, int] = (1, 1)
  padding: Sequence[Tuple[int, int]] = ((0, 0), (0, 0))

  @nn.compact
  def __call__(self, x):
    x = nn.Conv(self.features, self.kernel, strides=self.strides,
                padding=tuple(self.padding), use_bias=False,
                name="conv")(x)
    x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                     momentum=0.9, name="bn")(x)
    return nn.relu(x)


def _avg_pool_3(x):
  return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                     count_include_pad=True)


def _max_pool_3s2(x):
  return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
  pool_features: int

  @nn.compact
  def __call__(self, x):
    b1 = BasicConv(64, (1, 1), name="branch1x1")(x)
    b5 = BasicConv(48, (1, 1), name="branch5x5_1")(x)
    b5 = BasicConv(64, (5, 5), padding=((2, 2), (2, 2)),
                   name="branch5x5_2")(b5)
    b3 = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
    b3 = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)),
                   name="branch3x3dbl_2")(b3)
    b3 = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)),
                   name="branch3x3dbl_3")(b3)
    bp = BasicConv(self.pool_features, (1, 1),
                   name="branch_pool")(_avg_pool_3(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):

  @nn.compact
  def __call__(self, x):
    b3 = BasicConv(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
    bd = BasicConv(64, (1, 1), name="branch3x3dbl_1")(x)
    bd = BasicConv(96, (3, 3), padding=((1, 1), (1, 1)),
                   name="branch3x3dbl_2")(bd)
    bd = BasicConv(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
    return jnp.concatenate([b3, bd, _max_pool_3s2(x)], axis=-1)


class InceptionC(nn.Module):
  channels_7x7: int

  @nn.compact
  def __call__(self, x):
    c7 = self.channels_7x7
    b1 = BasicConv(192, (1, 1), name="branch1x1")(x)
    b7 = BasicConv(c7, (1, 1), name="branch7x7_1")(x)
    b7 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)),
                   name="branch7x7_2")(b7)
    b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)),
                   name="branch7x7_3")(b7)
    bd = BasicConv(c7, (1, 1), name="branch7x7dbl_1")(x)
    bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)),
                   name="branch7x7dbl_2")(bd)
    bd = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)),
                   name="branch7x7dbl_3")(bd)
    bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)),
                   name="branch7x7dbl_4")(bd)
    bd = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)),
                   name="branch7x7dbl_5")(bd)
    bp = BasicConv(192, (1, 1), name="branch_pool")(_avg_pool_3(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):

  @nn.compact
  def __call__(self, x):
    b3 = BasicConv(192, (1, 1), name="branch3x3_1")(x)
    b3 = BasicConv(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
    b7 = BasicConv(192, (1, 1), name="branch7x7x3_1")(x)
    b7 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)),
                   name="branch7x7x3_2")(b7)
    b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)),
                   name="branch7x7x3_3")(b7)
    b7 = BasicConv(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
    return jnp.concatenate([b3, b7, _max_pool_3s2(x)], axis=-1)


class InceptionE(nn.Module):

  @nn.compact
  def __call__(self, x):
    b1 = BasicConv(320, (1, 1), name="branch1x1")(x)
    b3 = BasicConv(384, (1, 1), name="branch3x3_1")(x)
    b3a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)),
                    name="branch3x3_2a")(b3)
    b3b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)),
                    name="branch3x3_2b")(b3)
    b3 = jnp.concatenate([b3a, b3b], axis=-1)
    bd = BasicConv(448, (1, 1), name="branch3x3dbl_1")(x)
    bd = BasicConv(384, (3, 3), padding=((1, 1), (1, 1)),
                   name="branch3x3dbl_2")(bd)
    bda = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)),
                    name="branch3x3dbl_3a")(bd)
    bdb = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)),
                    name="branch3x3dbl_3b")(bd)
    bd = jnp.concatenate([bda, bdb], axis=-1)
    bp = BasicConv(192, (1, 1), name="branch_pool")(_avg_pool_3(x))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
  """Eval-mode InceptionV3 trunk; returns (pool_2048, logits_1000)."""

  num_classes: int = 1000

  @nn.compact
  def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    x = BasicConv(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
    x = BasicConv(32, (3, 3), name="Conv2d_2a_3x3")(x)
    x = BasicConv(64, (3, 3), padding=((1, 1), (1, 1)),
                  name="Conv2d_2b_3x3")(x)
    x = _max_pool_3s2(x)
    x = BasicConv(80, (1, 1), name="Conv2d_3b_1x1")(x)
    x = BasicConv(192, (3, 3), name="Conv2d_4a_3x3")(x)
    x = _max_pool_3s2(x)
    x = InceptionA(32, name="Mixed_5b")(x)
    x = InceptionA(64, name="Mixed_5c")(x)
    x = InceptionA(64, name="Mixed_5d")(x)
    x = InceptionB(name="Mixed_6a")(x)
    x = InceptionC(128, name="Mixed_6b")(x)
    x = InceptionC(160, name="Mixed_6c")(x)
    x = InceptionC(160, name="Mixed_6d")(x)
    x = InceptionC(192, name="Mixed_6e")(x)
    x = InceptionD(name="Mixed_7a")(x)
    x = InceptionE(name="Mixed_7b")(x)
    x = InceptionE(name="Mixed_7c")(x)
    pool = jnp.mean(x, axis=(1, 2))  # global average pool -> (N, 2048)
    logits = nn.Dense(self.num_classes, name="fc")(pool)
    return pool, logits


def preprocess(images_u8: jax.Array, size: int = 299) -> jax.Array:
  """uint8 NHWC (any resolution) -> bilinear-resized [-1, 1] float at
  299x299 — pytorch-fid preprocessing, on-device."""
  x = images_u8.astype(jnp.float32) / 255.0
  if images_u8.shape[-1] == 1:
    x = jnp.repeat(x, 3, axis=-1)
  x = jax.image.resize(x, (x.shape[0], size, size, 3), method="bilinear")
  return x * 2.0 - 1.0


def init_params(rng: Optional[jax.Array] = None):
  """Random-init parameter tree (structure donor for weight loading)."""
  model = InceptionV3()
  rng = rng if rng is not None else jax.random.PRNGKey(0)
  variables = model.init(rng, jnp.zeros((1, 299, 299, 3), jnp.float32))
  return model, variables


def load_npz_params(path: str):
  """Load InceptionV3 weights from a torchvision-state_dict npz.

  Contract: keys are the torchvision ``inception_v3`` state_dict keys
  (e.g. ``Mixed_5b.branch1x1.conv.weight``); conv weights are (O, I, H, W)
  and are transposed to HWIO here; BN running stats map to flax
  ``batch_stats``. Produce the npz with:

      import torch, torchvision, numpy as np
      sd = torchvision.models.inception_v3(weights="DEFAULT").state_dict()
      np.savez("inception_v3.npz",
               **{k: v.numpy() for k, v in sd.items()})
  """
  import flax
  model, variables = init_params()
  loaded = dict(np.load(path))
  variables = flax.core.unfreeze(variables)
  params = jax.tree_util.tree_map(np.asarray, variables["params"])
  stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

  written = set()

  def put(tree, path_parts, value):
    node = tree
    for p in path_parts[:-1]:
      node = node[p]
    expect = node[path_parts[-1]]
    if expect.shape != value.shape:
      raise ValueError(f"{path_parts}: {value.shape} != {expect.shape}")
    node[path_parts[-1]] = value.astype(expect.dtype)
    written.add((id(tree),) + tuple(path_parts))

  for key, val in loaded.items():
    parts = key.split(".")
    # AuxLogits / bookkeeping keys FIRST: a pretrained torchvision
    # state_dict always contains AuxLogits.*.conv.weight etc., which
    # would otherwise match the conv/bn branches below and KeyError into
    # the (AuxLogits-free) flax tree — the skip was unreachable for them
    # (evaluation review r3; the unit test's synthetic npz has no
    # AuxLogits keys, so only a real-weights load hit this).
    if "num_batches_tracked" in key or parts[0] == "AuxLogits":
      continue
    if parts[-2:] == ["conv", "weight"]:
      put(params, parts[:-1] + ["kernel"], val.transpose(2, 3, 1, 0))
    elif parts[-2:] == ["bn", "weight"]:
      put(params, parts[:-1] + ["scale"], val)
    elif parts[-2:] == ["bn", "bias"]:
      put(params, parts[:-1] + ["bias"], val)
    elif parts[-2:] == ["bn", "running_mean"]:
      put(stats, parts[:-1] + ["mean"], val)
    elif parts[-2:] == ["bn", "running_var"]:
      put(stats, parts[:-1] + ["var"], val)
    elif parts == ["fc", "weight"]:
      put(params, ["fc", "kernel"], val.T)
    elif parts == ["fc", "bias"]:
      put(params, ["fc", "bias"], val)
    else:
      raise KeyError(f"unrecognized weight key {key}")

  # Completeness: every leaf of the flax tree must have been overwritten.
  # A partial npz (truncated save, filtered state_dict) silently keeping
  # random-init leaves would produce garbage scores NOT prefixed
  # 'unverified_' — the exact silent substitution SURVEY.md §7 hard-part
  # #5 forbids.
  missing = []
  for name, tree in (("params", params), ("batch_stats", stats)):
    for kp, _ in jax.tree_util.tree_flatten_with_path(tree)[0]:
      pp = (id(tree),) + tuple(
          getattr(k, "key", getattr(k, "name", str(k))) for k in kp)
      if pp not in written:
        missing.append(name + "/" + "/".join(map(str, pp[1:])))
  if missing:
    raise KeyError(
        f"npz {path} left {len(missing)} model leaves unloaded "
        f"(e.g. {missing[:3]}); refusing a partially-random network")
  return model, {"params": params, "batch_stats": stats}
