#!/usr/bin/env python
"""Reference-parity entry point: ``python run.py --dataset cifar10 ...``
(the reference's top-level ``run.py`` [U]). Thin shim over
``wcgan_tpu.cli.run``."""

import sys

from wcgan_tpu.cli.run import main

if __name__ == "__main__":
  sys.exit(main())
