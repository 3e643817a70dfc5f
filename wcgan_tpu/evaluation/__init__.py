"""Evaluation: Inception Score + FID, computed on-device.

Rebuilds the reference's evaluation stack (``gan/inception_score.py`` /
``gan/fid.py`` / ``scorer.py`` [U], SURVEY.md §3.4) in JAX: a flax
InceptionV3 feature network (local weights — this box has no egress; the
reference downloads a 2015 TF .pb at run time [U]), IS/FID math on-device
(matrix square root via on-device ``eigh`` by default — exact for the
near-singular Inception covariances, 0.26 s steady-state at 2048² — with
a matmul-only Newton–Schulz variant kept as ``method='ns'``), and a
scorer callback for the Trainer.
"""

from wcgan_tpu.evaluation.metrics import (  # noqa: F401
    fid_from_moments, frechet_distance, inception_score,
    moments_from_activations)
