#!/usr/bin/env python3
"""Hardware A/B for the two roofline-weak suite rows.

1. mstamp netsort: Batcher comparator network (MPX_MSTAMP_NETSORT=1,
   default) vs jnp.sort across dimensions, at the suite geometry
   (n=131072, m=256, d=4).  The env var is read at TRACE time and the
   jit cache does not key on it, so each variant runs in a fresh
   subprocess (the persistent compile cache keeps re-runs cheap);
   interleaved ABAB keeps adjacent runs in the same relay weather.

2. batch band/chunk sweep: the fleet row (256 x n=8192, m=64) measured
   at band=chunk=1024; panel shape governs both MXU tiling and the
   job count, so sweep a few geometries to find the fleet optimum.

Usage: python scripts/probe_mstamp_batch.py [--skip-mstamp] [--skip-batch]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_CHILD = """
import json, sys
from mpx.runtime import enable_compilation_cache
from mpx.bench import run_mstamp_benchmark
enable_compilation_cache()
row = run_mstamp_benchmark(131072, 256, 4)
print(json.dumps({"wall_s": row["wall_s"], "vs": row["vs_baseline"]}))
"""


def ab_mstamp(reps: int = 2):
    import json
    import subprocess

    for rep in range(reps):
        for v in ("1", "0"):
            env = dict(os.environ, MPX_MSTAMP_NETSORT=v)
            t0 = time.time()
            out = subprocess.run(
                [sys.executable, "-c", _CHILD], env=env, cwd=os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__))),
                capture_output=True, text=True, timeout=560,
            )
            line = out.stdout.strip().splitlines()[-1] if out.stdout else "{}"
            try:
                row = json.loads(line)
                print(
                    f"mstamp netsort={v}: wall={row['wall_s']:.2f}s "
                    f"vs_baseline={row['vs']:.3f} "
                    f"(proc total {time.time()-t0:.1f}s)",
                    flush=True,
                )
            except (ValueError, KeyError):
                print(f"mstamp netsort={v}: FAILED rc={out.returncode} "
                      f"stderr tail: {out.stderr[-300:]}", flush=True)


def sweep_batch():
    from mpx.bench import run_batch_benchmark

    for band, chunk in ((1024, 1024), (2048, 2048), (512, 2048),
                        (4096, 4096), (1024, 4096)):
        t0 = time.time()
        try:
            row = run_batch_benchmark(8192, 64, 256, band=band, chunk=chunk)
        except Exception as e:  # noqa: BLE001 — sweep survives bad geometry
            print(f"batch band={band} chunk={chunk}: FAILED {e}", flush=True)
            continue
        print(
            f"batch band={band} chunk={chunk}: wall={row['wall_s']:.3f}s "
            f"vs_baseline={row['vs_baseline']:.3f} "
            f"(total {time.time()-t0:.1f}s incl warmup)",
            flush=True,
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-mstamp", action="store_true")
    ap.add_argument("--skip-batch", action="store_true")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    from mpx.runtime import enable_compilation_cache

    enable_compilation_cache()
    if not args.skip_mstamp:
        ab_mstamp(args.reps)
    if not args.skip_batch:
        sweep_batch()


if __name__ == "__main__":
    main()
