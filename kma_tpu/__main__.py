"""`python -m kma_tpu` entry point (main.c:52 subcommand dispatch)."""

import sys

from .cli.main import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
