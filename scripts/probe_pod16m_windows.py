#!/usr/bin/env python3
"""Round-5 pod-16M diagnosis, part 2: is the missing windows table the
regression?

probe_pod16m.py refuted the HIGHEST-vs-HIGH hypothesis (ratio 1.12, not
~2) but measured the 16M-geometry argmax sweep at only ~1.6e10 pairs/s —
~6x below the 1M pass-A rate.  The 16M run is the only suite config
whose normalized-windows table exceeds MPX_WINDOWS_BUDGET (17 GB > 4 GB),
so every job rebuilds its (S+W, m) operand panels from T with an m-slice
stack.  This probe times the identical 16-job sweep at n=2M with the
windows table ON vs OFF; a matching ~6x gap confirms the panel rebuild
as the pod-row bottleneck.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mpx.runtime import enable_compilation_cache

enable_compilation_cache()

N, M = 1 << 21, 256
S, W = 4096, 16384
JOBS = 16

from mpx.kernels import band_geometry  # noqa: E402
from mpx.kernels.mxu import sweep_band_mxu  # noqa: E402
from mpx.ops.precompute import precompute_statistics  # noqa: E402

rng = np.random.default_rng(0)
T = np.cumsum(rng.standard_normal(N)).astype(np.float64)
w = N - M + 1

geom = band_geometry(S, W, M, w, 64, 64)
r0s = np.linspace(0, w - S - 1, JOBS).astype(np.int32)
k0s = np.full(JOBS, 1 << 19, np.int32)


def run(stats, tag):
    @jax.jit
    def sweep_many(stats, r0v, k0v):
        def body(carry, rk):
            r0, k0 = rk
            out = sweep_band_mxu(stats, r0, k0, geom, jnp.float32,
                                 precision=jax.lax.Precision.HIGHEST)
            return carry + jnp.max(out.row.value), None

        return jax.lax.scan(body, jnp.float32(0), (r0v, k0v))[0]

    r0v, k0v = jnp.asarray(r0s), jnp.asarray(k0s)
    np.asarray(sweep_many(stats, r0v, k0v))  # warm
    t0 = time.time()
    np.asarray(sweep_many(stats, r0v, k0v))
    dt = time.time() - t0
    pairs = JOBS * S * W
    print(f"{tag}: {dt:.3f}s for {JOBS} jobs -> {pairs/dt:.2e} pairs/s",
          flush=True)
    return pairs / dt


for windows in (True, False):
    t0 = time.time()
    stats = precompute_statistics(T, M, band=S, chunk=W, dtype="float32",
                                  windows=windows)
    jax.block_until_ready(stats.mu)
    print(f"# precompute+stage {time.time()-t0:.1f}s (windows={windows})",
          flush=True)
    run(stats, f"windows={windows}")
