"""Measure the mxu vs pallas f32 crossover in m (VERDICT round-1 #8).

mxu does 2m FLOPs/pair on the MXU plus O(m) panel-build HLO (compile
cost grows with m); the pallas recurrence does O(1)/pair on the VPU
(~m-independent, ~3e9 pairs/s measured round 1).  Run on hardware; the
result sets MXU_MAX_M in mpx/kernels/__init__.py.
"""
import sys
import time

import jax.numpy as jnp
import numpy as np

from mpx.config import make_job_grid
from mpx.driver import run_jobs
from mpx.ops.precompute import precompute_statistics
from mpx.runtime import enable_compilation_cache

enable_compilation_cache()

n = 65536
T = np.cumsum(np.random.default_rng(3).standard_normal(n))


def rate(kernel, m, band=2048, chunk=2048, tr=8, tc=2048, windows=None):
    w = n - m + 1
    stats = precompute_statistics(T, m, band=band, chunk=chunk,
                                  dtype="float32", windows=windows)
    grid = make_job_grid(w, band, chunk)
    args = dict(S=band, W=chunk, m=m, w=w, kernel=kernel, dtype="float32",
                tr=tr, tc=min(tc, chunk))
    t0 = time.perf_counter()
    for it in range(2):
        t0 = time.perf_counter()
        rows, cols = run_jobs(stats, jnp.asarray(grid.r0),
                              jnp.asarray(grid.k0), **args)
        np.asarray(rows.value[:4])
        dt = time.perf_counter() - t0
    pairs = w * (w - 1) / 2
    return pairs / dt, dt


if __name__ == "__main__":
    ms = [int(x) for x in (sys.argv[1:] or [512, 1024, 2048, 4096])]
    for m in ms:
        try:
            r, dt = rate("mxu", m, windows=True)
            print(f"mxu    m={m:6d}: {r:.3e} pairs/s ({dt:.2f}s warm)", flush=True)
        except Exception as e:
            print(f"mxu m={m}: failed {str(e)[:160]}", flush=True)
    for m in ms:
        try:
            r, dt = rate("pallas", m)
            print(f"pallas m={m:6d}: {r:.3e} pairs/s ({dt:.2f}s warm)", flush=True)
        except Exception as e:
            print(f"pallas m={m}: failed {str(e)[:160]}", flush=True)
