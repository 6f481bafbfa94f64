"""Round-4 showcase tuning probe: time the double-1M hybrid end-to-end
(warm) under one schedule variant per process and print the phase
breakdown + wall.  Env vars must precede backend init, so run one
variant per invocation:

  python scripts/probe_showcase_r4.py                     # committed config
  CHUNK=65536 python scripts/probe_showcase_r4.py         # wider pass-B jobs
  MPX_SPARSE_TIERS=32,96,256 python scripts/probe_showcase_r4.py
  REPS=3 python scripts/probe_showcase_r4.py              # variance check

Prints one JSON line per rep: {"wall_s": ..., "phases": {...}}.
"""

import json
import os
import sys
import time

import numpy as np
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

N = int(os.environ.get("N", 1 << 20))
M = int(os.environ.get("M", 256))
BAND = int(os.environ.get("BAND", 4096))
CHUNK = int(os.environ.get("CHUNK", 32768))
REPS = int(os.environ.get("REPS", 1))

from mpx.config import MatrixProfileConfig
from mpx.driver import compute_matrix_profile
from mpx.runtime import enable_compilation_cache
from mpx.utils.profile import BenchmarkProfile

enable_compilation_cache()

rng = np.random.default_rng(0)
T = np.cumsum(rng.standard_normal(N))
w = N - M + 1
pairs = w * (w - 1) / 2.0
cfg = MatrixProfileConfig(m=M, dtype="double", band=BAND, chunk=CHUNK)

# warmup/compile
t0 = time.time()
MP, MPI = compute_matrix_profile(T, config=cfg)
MP = np.asarray(MP)
print(f"# warmup {time.time() - t0:.1f}s", file=sys.stderr)

for rep in range(REPS):
    prof = BenchmarkProfile()
    t0 = time.time()
    MP, MPI = compute_matrix_profile(T, config=cfg, profile=prof)
    MP = np.asarray(MP)
    np.asarray(MPI)
    wall = time.time() - t0
    phases = {k: round(v / 1e9, 4) for k, v in prof.category_totals().items()}
    print(json.dumps({
        "variant": {
            "chunk": CHUNK, "band": BAND,
            "tiers": os.environ.get("MPX_SPARSE_TIERS", "default"),
            "device_stats": os.environ.get("MPX_HYBRID_DEVICE_STATS", "auto"),
        },
        "wall_s": round(wall, 3),
        "pairs_per_sec": round(pairs / wall),
        "vs_roofline_3e10": round(pairs / wall / 3e10, 3),
        "phases": phases,
    }))
