"""Measure the mxu vs pallas f32 crossover in m (VERDICT round-1 #8).

mxu does 2m FLOPs/pair on the MXU (HBM-epilogue-bound for small m,
compute-bound beyond); the pallas recurrence does O(1)/pair on the VPU
(~m-independent).  Sets MXU_MAX_M from data.
"""
import time

import jax.numpy as jnp
import numpy as np

from mpx.config import MatrixProfileConfig, make_job_grid
from mpx.driver import run_jobs
from mpx.ops.precompute import precompute_statistics
from mpx.runtime import enable_compilation_cache

enable_compilation_cache()

n = 262144
T = np.cumsum(np.random.default_rng(3).standard_normal(n))


def rate(kernel, m, band=2048, chunk=4096, tr=8, tc=2048):
    w = n - m + 1
    stats = precompute_statistics(T, m, band=band, chunk=chunk, dtype="float32")
    grid = make_job_grid(w, band, chunk)
    args = dict(S=band, W=chunk, m=m, w=w, kernel=kernel, dtype="float32",
                tr=tr, tc=tc)
    for _ in range(2):
        t0 = time.perf_counter()
        rows, cols = run_jobs(stats, jnp.asarray(grid.r0), jnp.asarray(grid.k0), **args)
        np.asarray(rows.value[:4])
        dt = time.perf_counter() - t0
    pairs = w * (w - 1) / 2
    return pairs / dt, dt


if __name__ == "__main__":
    for m in (1024, 2048, 4096, 8192, 16384):
        r, dt = rate("mxu", m)
        print(f"mxu    m={m:6d}: {r:.3e} pairs/s ({dt:.2f}s)")
    for m in (4096, 16384):
        try:
            r, dt = rate("pallas", m, tc=2048)
            print(f"pallas m={m:6d}: {r:.3e} pairs/s ({dt:.2f}s)")
        except Exception as e:
            print(f"pallas m={m}: failed {str(e)[:200]}")
    for m in (16384,):
        try:
            r, dt = rate("xla", m)
            print(f"xla    m={m:6d}: {r:.3e} pairs/s ({dt:.2f}s)")
        except Exception as e:
            print(f"xla m={m}: failed {str(e)[:200]}")
