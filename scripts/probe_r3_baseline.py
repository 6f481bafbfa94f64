"""Round-3 session-1 probes: quantify (a) per-job panel build cost on the
job path (windows on vs off), (b) the as-is ring tier rate at n=2^20 on a
1-device mesh.  Run one MODE per process (env vars must precede backend
init):

  MODE=job           python scripts/probe_r3_baseline.py
  MODE=job_nowin     MPX_WINDOWS_BUDGET=0 python scripts/probe_r3_baseline.py
  MODE=ring          python scripts/probe_r3_baseline.py
"""

import os
import sys
import time

import numpy as np

MODE = os.environ.get("MODE", "job")
N = int(os.environ.get("N", 1 << 20))
M = int(os.environ.get("M", 256))

from mpx.runtime import enable_compilation_cache

enable_compilation_cache()

rng = np.random.default_rng(7)
T = np.cumsum(rng.standard_normal(N))
w = N - M + 1
pairs = w * (w - 1) / 2.0


def run_job():
    from mpx.config import MatrixProfileConfig
    from mpx.driver import compute_matrix_profile

    cfg = MatrixProfileConfig(m=M, dtype="float32", kernel="mxu")
    MP, MPI = compute_matrix_profile(T, config=cfg)
    return np.asarray(MP)


def run_ring():
    from mpx.parallel.ring import run_ring_sharded

    MP, _ = run_ring_sharded(
        T, M, num_shards=1,
        band=int(os.environ.get("BAND", 4096)),
        chunk=int(os.environ.get("CHUNK", 4096)),
    )
    return np.asarray(MP)


def run_ring_f64():
    from mpx.parallel.ring import run_ring_hybrid_f64
    from mpx.utils.profile import BenchmarkProfile

    prof = BenchmarkProfile()
    MP, _ = run_ring_hybrid_f64(
        T, M, num_shards=1,
        band=int(os.environ.get("BAND", 4096)),
        chunk=int(os.environ.get("CHUNK", 4096)),
        profile=prof,
    )
    print(prof.report(), flush=True)
    return np.asarray(MP)


fn = {"ring": run_ring, "ringf64": run_ring_f64}.get(MODE, run_job)

t0 = time.perf_counter()
mp = fn()
t1 = time.perf_counter()
print(f"{MODE}: cold {t1 - t0:.2f}s", flush=True)
t0 = time.perf_counter()
mp = fn()
t1 = time.perf_counter()
wall = t1 - t0
print(f"{MODE}: warm {wall:.2f}s  {pairs / wall:.3e} pairs/s  "
      f"MP[0]={mp[0]:.6f}", flush=True)
