#!/usr/bin/env python3
"""Driver benchmark entry point: prints one JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}."""

import sys

from mpx.bench import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
