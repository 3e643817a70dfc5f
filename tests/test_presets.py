"""Every BASELINE preset must parse and build a runnable experiment
(dataset swapped to synthetic — the real archives aren't on this box)."""

import pytest

from wcgan_tpu.cli.presets import PRESETS, preset_argv
from wcgan_tpu.cli.run import build_experiment, build_parser

TINY_OVERRIDES = [
    "--dataset", "synthetic", "--synthetic_size", "64",
    "--batch_size", "8", "--generator_filters", "16,16,16",
    "--discriminator_filters", "16,16", "--ns_iters", "6",
    "--mesh", "0",  # single (CPU) device for the build test
]


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_preset_builds(name):
  argv = preset_argv(name, TINY_OVERRIDES)
  args = build_parser().parse_args(argv)
  trainer = build_experiment(args)
  assert trainer.state.step == 0
  # Conditional presets must actually produce conditional models.
  if "--conditional" in PRESETS[name] or "PROJECTIVE" in PRESETS[name]:
    assert trainer.gan_cfg.num_classes > 0


def test_preset_mesh_flag_respected():
  argv = preset_argv("imagenet64_cwc_dp",
                     ["--dataset", "synthetic", "--synthetic_size", "64",
                      "--batch_size", "16, ".replace(", ", ""),
                      "--generator_filters", "16,16,16",
                      "--discriminator_filters", "16,16",
                      "--ns_iters", "6", "--mesh", "8", "--bf16"])
  args = build_parser().parse_args(argv)
  assert args.mesh == 8
  trainer = build_experiment(args)
  assert trainer.mesh is not None
  assert trainer.mesh.devices.size == 8
