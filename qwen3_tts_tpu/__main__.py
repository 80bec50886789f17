"""`python -m qwen3_tts_tpu` launches the demo CLI (reference __main__.py)."""

import sys

from .cli.demo import main

if __name__ == "__main__":
    sys.exit(main())
