#!/usr/bin/env python3
"""Single verbose topk-f64 run at the suite geometry with live phase
output — measures the wide-K2 escalation's effect on the 832s round-4
wall without paying the bench harness's warmup+timed double run.

Usage: python scripts/probe_topk_wall.py [--n 1048576] [--k 4]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mpx import MatrixProfileConfig  # noqa: E402
from mpx.hybrid import compute_topk_profile_f64_hybrid  # noqa: E402
from mpx.runtime import enable_compilation_cache  # noqa: E402
from mpx.utils.logging import Logger  # noqa: E402
from mpx.utils.profile import BenchmarkProfile  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--m", type=int, default=256)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()

    Logger.verbose = True
    enable_compilation_cache()
    T = np.cumsum(np.random.default_rng(0).standard_normal(args.n))
    cfg = MatrixProfileConfig(m=args.m, dtype="double",
                              band=4096, chunk=16384)
    for rep in range(args.reps):
        prof = BenchmarkProfile()
        t0 = time.time()
        D, I = compute_topk_profile_f64_hybrid(
            T, args.k, cfg, profile=prof
        )
        wall = time.time() - t0
        print(f"rep {rep}: wall={wall:.1f}s  D[0]={np.asarray(D)[0]}",
              flush=True)
        prof.report()


if __name__ == "__main__":
    main()
