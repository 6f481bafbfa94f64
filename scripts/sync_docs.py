#!/usr/bin/env python3
"""Regenerate the README benchmark table from BENCH_SUITE.json.

Keeps the README in lockstep with the measured artifact (stale doc
numbers were a round-2 review finding).  The table lives between the
BENCH_TABLE_START/END markers; everything else is untouched.

Usage: python scripts/sync_docs.py [--check]
  --check  exit 1 if the README is out of date (for CI), write nothing
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpx.bench import suite_table  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
README = os.path.join(REPO, "README.md")
SUITE_JSON = os.path.join(REPO, "BENCH_SUITE.json")
START = "<!-- BENCH_TABLE_START (auto-generated: python scripts/sync_docs.py) -->"
END = "<!-- BENCH_TABLE_END -->"


def main() -> int:
    check = "--check" in sys.argv
    with open(SUITE_JSON) as f:
        rows = json.load(f)
    table = suite_table(rows)

    with open(README) as f:
        text = f.read()
    try:
        head, rest = text.split(START, 1)
        _, tail = rest.split(END, 1)
    except ValueError:
        print(f"README markers missing ({START!r}/{END!r})", file=sys.stderr)
        return 1
    new = f"{head}{START}\n{table}\n{END}{tail}"
    if new == text:
        print("README benchmark table is up to date")
        return 0
    if check:
        print("README benchmark table is STALE — run scripts/sync_docs.py",
              file=sys.stderr)
        return 1
    with open(README, "w") as f:
        f.write(new)
    print(f"README benchmark table refreshed ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
