#!/usr/bin/env python3
"""Driver benchmark entry point: prints one JSON line
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

With no arguments this measures the reference's showcase job
(/root/reference/README.md:35: double, n=2^20, m=256) through the
hybrid double tier — the headline number.  Any explicit flags are
passed straight to `mpx bench` (see `python bench.py --help`), so
`python bench.py --dtype float32` still measures the float tier and
`python bench.py --suite` runs every BASELINE.md config.
"""

import sys

from mpx.bench import main

SHOWCASE = ["-n", "1048576", "-m", "256", "--dtype", "double",
            "--band", "4096", "--chunk", "32768"]

if __name__ == "__main__":
    argv = sys.argv[1:] or SHOWCASE
    sys.exit(main(argv))
