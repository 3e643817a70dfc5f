"""Spelling-freeze test for the CLI contract (VERDICT r3 task #6).

The flag surface mirrors the reference's ``gan/cmd.py`` +
``run.py`` argparse vocabulary [U] (SURVEY.md §8.2 — the exact
spellings are the highest-risk unverified reconstruction). This test
pins ``build_parser()`` to the checked-in golden
``docs/CLI_SURFACE.md`` so any accidental rename/default/choices drift
fails CI; intentional changes regenerate via
``python scripts/cli_surface.py --write`` and leave a reviewable diff.
"""

import os
import sys

import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))


def _render():
  sys.path.insert(0, os.path.join(ROOT, "scripts"))
  import cli_surface
  return cli_surface.render(), cli_surface.GOLDEN


def test_cli_surface_matches_golden():
  text, golden_path = _render()
  assert os.path.exists(golden_path), (
      "docs/CLI_SURFACE.md missing — run scripts/cli_surface.py --write")
  with open(golden_path) as f:
    golden = f.read()
  if golden != text:
    import difflib
    diff = "\n".join(difflib.unified_diff(
        golden.splitlines(), text.splitlines(),
        "docs/CLI_SURFACE.md", "build_parser()", lineterm="", n=1))
    pytest.fail(
        "CLI surface drifted from the frozen golden (SURVEY.md §8.2 "
        "reconstruction). If intentional, run scripts/cli_surface.py "
        f"--write and commit the diff:\n{diff}")


def test_cli_surface_covers_reconstructed_core_flags():
  """The golden must keep covering the reconstructed reference
  vocabulary — a drifted DELETION should fail even if someone
  regenerates the golden without noticing (belt for the freeze's
  braces). Spot list = SURVEY.md §2a arg-system rows."""
  text, _ = _render()
  for flag in ("--batch_size", "--number_of_epochs", "--training_ratio",
               "--generator_batch_multiple", "--lr_decay_schedule",
               "--generator_block_norm", "--generator_block_coloring",
               "--generator_last_norm", "--generator_last_coloring",
               "--discriminator_norm", "--discriminator_coloring",
               "--spectral_iterations", "--fully_diff_spectral",
               "--conv_singular", "--filters_emb", "--gan_type",
               "--gradient_penalty_weight", "--phase", "--dataset"):
    assert f"`{flag}`" in text, f"core reconstructed flag {flag} missing"
