#!/usr/bin/env python3
"""Per-phase breakdown of a small fused-tier run (VERDICT weak #3 follow-up).

Runs the real-italian-power f64 suite workload (n=29931, m=128, double)
with a BenchmarkProfile attached and prints the phase report plus the
raw wall, so the residual overhead (packed fetch, host rescore, staging)
is attributable.  Usage: python scripts/probe_small_fused.py [repeats]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mpx.config import MatrixProfileConfig
from mpx.io.datasets import load_dataset
from mpx.driver import compute_matrix_profile
from mpx.runtime import enable_compilation_cache
from mpx.utils.profile import BenchmarkProfile


def main() -> int:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    enable_compilation_cache()
    T = load_dataset("italianpowerdemand.txt", category="real")
    cfg = MatrixProfileConfig(m=128, dtype="double")

    compute_matrix_profile(T, config=cfg)  # warm/compile
    walls = []
    prof = None
    for _ in range(repeats):
        prof = BenchmarkProfile()
        t0 = time.time()
        MP, MPI = compute_matrix_profile(T, config=cfg, profile=prof)
        np.asarray(MP)
        walls.append(time.time() - t0)
    print(prof.report())
    print(json.dumps({
        "n": int(T.size), "walls_s": [round(w, 4) for w in walls],
        "best_s": round(min(walls), 4),
        "phases": json.loads(prof.as_json()),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
