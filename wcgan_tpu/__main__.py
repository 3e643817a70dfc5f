"""``python -m wcgan_tpu`` → the experiment CLI."""

import sys

from wcgan_tpu.cli.run import main

sys.exit(main())
