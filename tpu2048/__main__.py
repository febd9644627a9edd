"""``python -m tpu2048`` — CLI entry point."""

import sys

from tpu2048.cli.main import main

sys.exit(main())
