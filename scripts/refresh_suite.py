#!/usr/bin/env python3
"""Re-run the benchmark suite and refresh every artifact that quotes it.

One command for hardware-measurement days:

    python scripts/refresh_suite.py [--only NAME ...]

1. runs `mpx bench --suite` on the real chip (every non-huge row),
2. carries over rows that were NOT re-run from the existing
   BENCH_SUITE.json (e.g. the executed pod-f32-16777216 row, which takes
   ~an hour and is re-run only explicitly) — carried rows are marked
   ``carried: true`` and a failed re-run attaches ``last_attempt`` so
   stale numbers self-identify,
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


#: Prior rows measured within this many hours of the refresh run's own
#: timestamp still count as fresh (chunked hardware windows run one
#: refresh per row group within the same measurement session).
FRESH_WITHIN_HOURS = 12.0


def merge_rows(results: list, prior: list, log=None, now=None) -> list:
    """Merge a fresh run_suite result list into the prior artifact rows.

    Fresh measured rows win.  Prior rows not re-measured are kept with
    ``carried: true`` unless their ``measured_at`` is within
    ``FRESH_WITHIN_HOURS`` of *now* (the refresh run's own timestamp —
    NOT the calendar date: a date comparison misclassifies rows near
    midnight and makes the behavior depend on the day the code runs);
    if the re-run FAILED, the prior row additionally records
    ``last_attempt`` (error + when + commit).  Failures with no prior
    row keep their FAILED marker row so the attempt is on record.
    """
    from datetime import datetime, timezone

    log = log or (lambda msg: print(msg, file=sys.stderr))
    now = now or datetime.now(timezone.utc)
    fresh = [dict(r) for r in results if "failed" not in r]
    for r in fresh:
        r.pop("carried", None)  # fresh measurement supersedes its prior
        r.pop("last_attempt", None)
    failed = {r["name"]: dict(r) for r in results if "failed" in r}
    ran = {r["name"] for r in fresh}

    def is_recent(measured_at: str) -> bool:
        try:
            t = datetime.fromisoformat(measured_at.replace("Z", "+00:00"))
        except ValueError:
            return False
        return abs((now - t).total_seconds()) <= FRESH_WITHIN_HOURS * 3600

    kept = []
    for row in prior:
        if row["name"] in ran:
            continue
        row = dict(row)
        # Prior measured row survives, but self-identifies as stale
        # (round-3 review: carried rows were indistinguishable from
        # fresh ones) unless it was measured within this session.
        measured_at = str(row.get("provenance", {}).get("measured_at", ""))
        if not is_recent(measured_at):
            row["carried"] = True
        else:
            row.pop("carried", None)
        if row["name"] in failed:
            att = failed.pop(row["name"])
            row["last_attempt"] = {
                "failed": att["failed"],
                "at": att.get("provenance", {}).get("measured_at"),
                "commit": att.get("provenance", {}).get("commit"),
            }
            log(f"# kept prior row (re-run FAILED): {row['name']}")
        else:
            log(f"# kept prior row: {row['name']}")
        kept.append(row)
    # failures with no prior row to fall back on: record the marker
    kept.extend(failed.values())

    order = {cfg["name"]: i for i, cfg in enumerate(SUITE)}
    return sorted(fresh + kept, key=lambda r: order.get(r["name"], 99))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", action="append", default=None,
                    help="restrict to named configs (repeatable)")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    prior = []
    if os.path.exists(OUT):
        with open(OUT) as f:
            prior = json.load(f)

    # Persist after EVERY row: a relay death mid-suite must not discard
    # rows already measured (round-4 incident: a hung row lost ~1 h of
    # measurements that existed only in the in-process result list).
    done = []

    def on_row(row):
        done.append(row)
        merged_now = merge_rows(list(done), prior)
        tmp = OUT + ".tmp"
        with open(tmp, "w") as f:
            json.dump(merged_now, f, indent=2)
            f.write("\n")
        os.replace(tmp, OUT)
        print(f"# row {row['name']} persisted "
              f"({'FAILED' if 'failed' in row else 'ok'})", file=sys.stderr)

    results = run_suite(names=args.only, verbose=args.verbose, on_row=on_row)
    merged = merge_rows(results, prior)
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=2)
        f.write("\n")
    print(f"# wrote {OUT} ({len(merged)} rows)", file=sys.stderr)
    print(suite_table(merged))
    return 0


if __name__ == "__main__":
    sys.exit(main())
