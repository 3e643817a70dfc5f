#!/usr/bin/env python
"""Render the full CLI flag surface to a golden markdown table.

The flag vocabulary is the public API the north star says to match, and
it is RECONSTRUCTED (SURVEY.md §8.2 names the exact spellings as the
highest-risk unverified items — the reference mount is empty). This
freezes the reconstruction: ``docs/CLI_SURFACE.md`` is the checked-in
golden, ``tests/test_cli_surface.py`` fails on any drift, and the day
the reference appears the diff against truth is one file (VERDICT r3
task #6).

    python scripts/cli_surface.py           # print current surface
    python scripts/cli_surface.py --write   # refresh the golden
    python scripts/cli_surface.py --check   # exit 1 on drift
"""

from __future__ import annotations

import argparse
import os
import sys

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
GOLDEN = os.path.join(ROOT, "docs", "CLI_SURFACE.md")

_HEADER = """\
# CLI surface (generated — do not hand-edit)

Golden snapshot of ``wcgan_tpu.cli.run.build_parser()``: every flag,
type, default, and choice set, in definition order. Regenerate with
``python scripts/cli_surface.py --write``; ``tests/test_cli_surface.py``
fails if this file and the parser disagree, so accidental drift from
the documented reconstruction (SURVEY.md §8.2 [U]) is caught in CI and
intentional changes leave a reviewable diff here.

| flag | type | default | choices |
|---|---|---|---|
"""


def render() -> str:
  sys.path.insert(0, ROOT)
  import jax
  jax.config.update("jax_platforms", "cpu")  # CLAUDE.md: env var unreliable
  from wcgan_tpu.cli.run import build_parser
  rows = []
  for act in build_parser()._actions:
    if act.dest == "help":
      continue
    flag = ", ".join(act.option_strings) or act.dest
    if isinstance(act, argparse._StoreTrueAction):
      typ = "store_true"
    elif act.type is None:
      typ = "str"
    else:
      typ = getattr(act.type, "__name__", str(act.type))
    default = repr(act.default)
    choices = ", ".join(str(c) for c in act.choices) if act.choices else ""
    rows.append(f"| `{flag}` | {typ} | `{default}` | {choices} |")
  return _HEADER + "\n".join(rows) + "\n"


def main() -> int:
  p = argparse.ArgumentParser()
  p.add_argument("--write", action="store_true")
  p.add_argument("--check", action="store_true")
  a = p.parse_args()
  text = render()
  if a.write:
    with open(GOLDEN, "w") as f:
      f.write(text)
    print(f"wrote {GOLDEN}")
    return 0
  if a.check:
    try:
      with open(GOLDEN) as f:
        golden = f.read()
    except FileNotFoundError:
      golden = ""
    if golden != text:
      print("CLI surface drifted from docs/CLI_SURFACE.md — run "
            "scripts/cli_surface.py --write if intentional",
            file=sys.stderr)
      return 1
    print("CLI surface matches golden")
    return 0
  sys.stdout.write(text)
  return 0


if __name__ == "__main__":
  raise SystemExit(main())
