"""The round-5 sweep's stage table is the round's on-chip run queue;
pin its construction (names, ordering, resume subsets) without jax or
a chip — a wrong command here burns serialized tunnel time."""

import importlib.util
import os

_path = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                     "r5_sweep.py")
_spec = importlib.util.spec_from_file_location("r5_sweep", _path)
r5_sweep = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(r5_sweep)


def _names(stages):
  return [s[0] for s in stages]


def test_mfu_resume_subset():
  stages = r5_sweep.stages_for(["mfu"], ["cfg3", "cfg5"], [])
  assert _names(stages) == ["mfu_cfg3", "mfu_cfg5"]
  for s in stages:
    assert "scripts/mfu.py" in s[1]


def test_digits_stage_trains_before_evaluating():
  names = _names(r5_sweep.stages_for(["digits"], [], []))
  assert names.index("digits_acgan_train") < names.index(
      "digits_acgan_fidelity")
  assert names.index("digits_ema_train") < names.index(
      "digits_ema_fid_auto")
  # The EMA A/B reads BOTH metrics BOTH ways from the same checkpoints.
  for mode in ("auto", "raw"):
    assert f"digits_ema_fid_{mode}" in names
    assert f"digits_ema_fidelity_{mode}" in names


def test_digits_acgan_run_is_acgan_conditional():
  stages = {s[0]: s for s in r5_sweep.stages_for(["digits"], [], [])}
  train = stages["digits_acgan_train"][1]
  assert "AC_GAN" in train and "digits" in train
  fid = stages["digits_acgan_fidelity"][1]
  assert "AC_GAN" in fid
  # Eval stages keep their markdown stdout (4th field).
  assert stages["digits_acgan_fidelity"][3] is True


def test_soak_stages_carry_the_verdict_flags():
  stages = {s[0]: s for s in r5_sweep.stages_for(
      ["soakdr", "soakrun"], [], [])}
  dr = stages["soak_dr_10k"][1]
  assert dr[dr.index("--generator_block_norm") + 1] == "dr"
  run = stages["soak_running_100k"][1]
  assert run[run.index("--d_fake_stats") + 1] == "running"
  assert run[run.index("--wc_momentum") + 1] == "0.9"
  assert run[run.index("--number_of_epochs") + 1] == "200"
