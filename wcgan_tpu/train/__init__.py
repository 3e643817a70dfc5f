"""Training: state, LR schedules, the fused K-D+1-G XLA step, Trainer."""

from wcgan_tpu.train import schedules, state, step  # noqa: F401
