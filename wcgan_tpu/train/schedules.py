"""Learning-rate decay schedules.

Mirrors the reference's ``--lr_decay_schedule`` choices applied by
re-assigning the Keras optimizer lr each epoch (``gan/train.py`` LR-decay
helpers [U]): ``none`` / ``linear`` / ``half-linear`` / ``linear-end``.
Here they are per-step optax schedules compiled into the train program —
no host-side lr pokes.

Semantics (t = step/total_steps in [0, 1]):
  none        lr
  linear      lr * (1 - t)                      (decay to 0 over the run)
  half-linear lr             for t < 1/2;  lr * 2(1 - t)     after
  linear-end  lr             for t < 0.9;  lr * 10(1 - t)    after
                              (final-10% ramp to zero; exact reference
                              breakpoint unverified [U] — documented knob)
"""

from __future__ import annotations

import optax


def lr_schedule(name: str, base_lr: float,
                total_steps: int) -> optax.Schedule:
  total = max(int(total_steps), 1)
  if name in (None, "none", ""):
    return optax.constant_schedule(base_lr)
  if name == "linear":
    return optax.linear_schedule(base_lr, 0.0, total)
  if name == "half-linear":
    half = total // 2
    return optax.join_schedules(
        [optax.constant_schedule(base_lr),
         optax.linear_schedule(base_lr, 0.0, total - half)],
        boundaries=[half])
  if name == "linear-end":
    knee = int(total * 0.9)
    return optax.join_schedules(
        [optax.constant_schedule(base_lr),
         optax.linear_schedule(base_lr, 0.0, total - knee)],
        boundaries=[knee])
  raise ValueError(f"unknown lr schedule {name!r}")


def adam(base_lr: float, beta1: float = 0.0, beta2: float = 0.9,
         schedule: str = "none", total_steps: int = 1
         ) -> optax.GradientTransformation:
  """Adam with the reference's GAN defaults (lr 2e-4, beta1 0.0,
  beta2 0.9 — ``gan/cmd.py`` defaults [U])."""
  return optax.adam(lr_schedule(schedule, base_lr, total_steps),
                    b1=beta1, b2=beta2)
