#!/usr/bin/env python3
"""Re-run the benchmark suite and refresh every artifact that quotes it.

One command for hardware-measurement days:

    python scripts/refresh_suite.py [--only NAME ...]

1. runs `mpx bench --suite` on the real chip (every non-huge row),
2. carries over rows that were NOT re-run from the existing
   BENCH_SUITE.json (e.g. the executed pod-f32-16777216 row, which takes
   ~an hour and is re-run only explicitly),
3. writes BENCH_SUITE.json sorted in SUITE order,
4. prints the README markdown table to stdout for pasting.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpx.bench import SUITE, run_suite, suite_table  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH_SUITE.json")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", action="append", default=None,
                    help="restrict to named configs (repeatable)")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    results = run_suite(names=args.only, verbose=args.verbose)
    ran = {r["name"] for r in results}

    kept = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            for row in json.load(f):
                if row["name"] not in ran:
                    kept.append(row)
                    print(f"# kept prior row: {row['name']}", file=sys.stderr)

    order = {cfg["name"]: i for i, cfg in enumerate(SUITE)}
    merged = sorted(results + kept, key=lambda r: order.get(r["name"], 99))
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=2)
        f.write("\n")
    print(f"# wrote {OUT} ({len(merged)} rows)", file=sys.stderr)
    print(suite_table(merged))
    return 0


if __name__ == "__main__":
    sys.exit(main())
