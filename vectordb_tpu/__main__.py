"""Entry point: python -m vectordb_tpu <command>."""

import sys

from .cli import main

sys.exit(main())
