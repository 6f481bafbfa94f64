#!/usr/bin/env python3
"""Interleaved A/B of the ring sparse pass B's two-tier panel width.

The round-5 suite re-measure could not separate the two-tier lax.cond
(commit a07d9bf) from relay speed drift (ring-f32 measured 11.15s at
19:13Z and 14.89s at 22:3xZ with the SAME code path).  This probe runs
the flagship ring-f64 config with RING_SUSPECT_F_SMALL in {64, 0}
interleaved ABAB in one process, so every pair of adjacent runs sees the
same relay weather.  Decision rule: flip the default to 0 if the
two-tier variant is not faster by more than the adjacent-pair spread.

Usage: python scripts/probe_ring_ab.py [--n 1048576] [--reps 2]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import mpx.parallel.ring as ring  # noqa: E402
from mpx import MatrixProfileConfig, compute_matrix_profile  # noqa: E402
from mpx.runtime import enable_compilation_cache  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--m", type=int, default=256)
    ap.add_argument("--dtype", default="float64")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    enable_compilation_cache()
    T = np.cumsum(np.random.default_rng(0).standard_normal(args.n))
    cfg = MatrixProfileConfig(
        m=args.m, dtype=args.dtype, band=4096, chunk=16384,
        num_shards=1, shard_mode="ring",
    )

    def run():
        t0 = time.time()
        MP, MPI = compute_matrix_profile(T, config=cfg)
        return time.time() - t0, float(np.asarray(MP[: 4]).sum())

    # warm both variants' executables first (compile excluded from A/B)
    for v in (64, 0):
        ring.RING_SUSPECT_F_SMALL = v
        wall, chk = run()
        print(f"warmup F_SMALL={v}: {wall:.2f}s chk={chk:.6f}", flush=True)

    walls = {64: [], 0: []}
    for _ in range(args.reps):
        for v in (64, 0):
            ring.RING_SUSPECT_F_SMALL = v
            wall, chk = run()
            walls[v].append(wall)
            print(f"F_SMALL={v}: {wall:.2f}s chk={chk:.6f}", flush=True)
    for v, ws in walls.items():
        print(f"F_SMALL={v}: mean {np.mean(ws):.2f}s  runs {ws}")


if __name__ == "__main__":
    main()
