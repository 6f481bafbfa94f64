#!/usr/bin/env python3
"""Regenerate every doc table that quotes BENCH_SUITE.json.

Keeps the README and PARITY.md in lockstep with the measured artifact
(stale doc numbers were a round-2 AND round-3 review finding — the
artifact is the single source of truth, docs only render it).  Each
table lives between START/END markers; everything else is untouched.

Usage: python scripts/sync_docs.py [--check]
  --check  exit 1 if any doc is out of date (for CI), write nothing
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpx.bench import suite_table  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUITE_JSON = os.path.join(REPO, "BENCH_SUITE.json")

# (path, start marker, end marker)
TARGETS = [
    (
        os.path.join(REPO, "README.md"),
        "<!-- BENCH_TABLE_START (auto-generated: python scripts/sync_docs.py) -->",
        "<!-- BENCH_TABLE_END -->",
    ),
    (
        os.path.join(REPO, "PARITY.md"),
        "<!-- PARITY_BENCH_START (auto-generated: python scripts/sync_docs.py) -->",
        "<!-- PARITY_BENCH_END -->",
    ),
]


def sync_one(path: str, start: str, end: str, table: str, check: bool) -> int:
    with open(path) as f:
        text = f.read()
    try:
        head, rest = text.split(start, 1)
        _, tail = rest.split(end, 1)
    except ValueError:
        print(f"{path}: markers missing ({start!r}/{end!r})", file=sys.stderr)
        return 1
    new = f"{head}{start}\n{table}\n{end}{tail}"
    if new == text:
        print(f"{os.path.basename(path)} benchmark table is up to date")
        return 0
    if check:
        print(f"{os.path.basename(path)} benchmark table is STALE — "
              f"run scripts/sync_docs.py", file=sys.stderr)
        return 1
    with open(path, "w") as f:
        f.write(new)
    print(f"{os.path.basename(path)} benchmark table refreshed")
    return 0


def main() -> int:
    check = "--check" in sys.argv
    with open(SUITE_JSON) as f:
        rows = json.load(f)
    table = suite_table(rows)
    rc = 0
    for path, start, end in TARGETS:
        rc |= sync_one(path, start, end, table, check)
    return rc


if __name__ == "__main__":
    sys.exit(main())
