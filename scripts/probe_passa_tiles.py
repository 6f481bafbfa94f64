"""Sweep pass-A job tile geometry (S, W): does a VMEM-sized P tile get
the max-reduce fused into the matmul (avoiding 4B/pair of HBM)?"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpx.config import make_job_grid
from mpx.hybrid import default_margin, run_max_jobs
from mpx.ops.precompute import precompute_statistics
from mpx.runtime import enable_compilation_cache

enable_compilation_cache()

n, m = 1 << 20, 256
rng = np.random.default_rng(0)
T = np.cumsum(rng.standard_normal(n))
w = n - m + 1
margin = default_margin(m)

for S, W in [(4096, 16384), (4096, 4096), (8192, 8192), (2048, 16384),
             (8192, 16384), (4096, 32768), (8192, 32768), (16384, 16384)]:
    stats = precompute_statistics(T, m, band=S, chunk=W, dtype="float32")
    jax.block_until_ready(stats.mu)
    pw = stats.mu.shape[0]
    grid = make_job_grid(w, S, W)
    for _ in range(2):
        t0 = time.perf_counter()
        thr = run_max_jobs(
            stats, jnp.asarray(grid.r0), jnp.asarray(grid.k0),
            jnp.float32(margin), S=S, W=W, m=m, w=w, tr=64, tc=64, pw=pw,
        )
        np.asarray(thr)
        dt = time.perf_counter() - t0
    npairs = len(grid.r0) * S * W
    print(f"S={S:6d} W={W:6d} jobs={len(grid.r0):5d}: {dt:6.2f}s "
          f"({npairs / dt / 1e9:.1f}G tilepairs/s)", flush=True)
