"""CLI: argparse surface mirroring the reference's run.py / gan/cmd.py."""

from wcgan_tpu.cli.run import build_parser, main  # noqa: F401
