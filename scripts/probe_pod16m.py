"""Round-4 pod-16M diagnosis probe (~5 min, not the full ~1 h row).

The round-3 artifact's pod-f32-16777216 row ran at 1.28x roofline where
scale-f32-2097152 hits 2.05x.  Hypothesis: the pod row pins kernel=mxu
(one-pass argmax sweep at f32 Precision.HIGHEST = SIX bf16 passes on
the MXU), while the 2M row auto-routes through the hybrid (THREE-pass
HIGH sweep + cheap sparse pass B + exact rescore) — a ~2x per-pair
matmul-volume gap, not an HBM/staging regression.

This probe times a handful of 16M-geometry jobs at HIGHEST vs HIGH on
the real chip and prints the per-pair rates; a ~2x ratio confirms the
hypothesis (and bounds what a 16M hybrid-style tier could recover).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from mpx.runtime import enable_compilation_cache

enable_compilation_cache()

N, M = 1 << 24, 256
S, W = 4096, 16384
JOBS = 16

from mpx.kernels import band_geometry
from mpx.kernels.mxu import sweep_band_mxu
from mpx.ops.precompute import precompute_statistics

rng = np.random.default_rng(0)
T = np.cumsum(rng.standard_normal(N)).astype(np.float64)
w = N - M + 1

t0 = time.time()
stats = precompute_statistics(T, M, band=S, chunk=W, dtype="float32",
                              windows=False)
jax.block_until_ready(stats.mu)
print(f"# precompute+stage {time.time()-t0:.1f}s (windows=False, 16M does "
      f"not fit the windows budget)")

geom = band_geometry(S, W, M, w, 64, 64)
r0s = np.linspace(0, w - S - 1, JOBS).astype(np.int32)
k0s = np.full(JOBS, 1 << 20, np.int32)


def run(precision, tag):
    from functools import partial

    @partial(jax.jit, static_argnames=())
    def sweep_many(stats, r0v, k0v):
        def body(carry, rk):
            r0, k0 = rk
            out = sweep_band_mxu(stats, r0, k0, geom, jnp.float32,
                                 precision=precision)
            return carry + jnp.max(out.row.value), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), (r0v, k0v))
        return acc

    r0v, k0v = jnp.asarray(r0s), jnp.asarray(k0s)
    acc = sweep_many(stats, r0v, k0v)  # compile+warm
    jax.block_until_ready(acc)
    np.asarray(acc)
    t0 = time.time()
    acc = sweep_many(stats, r0v, k0v)
    jax.block_until_ready(acc)
    np.asarray(acc)
    dt = time.time() - t0
    pairs = JOBS * S * W
    print(f"{tag}: {dt:.3f}s for {JOBS} jobs -> "
          f"{pairs/dt/1e10:.2f}e10 pairs/s")
    return dt


hi = run(jax.lax.Precision.HIGHEST, "HIGHEST (6-pass, the pod row's mode)")
h3 = run(jax.lax.Precision.HIGH, "HIGH    (3-pass, the hybrid's mode)")
print(f"ratio HIGHEST/HIGH = {hi/h3:.2f} (expect ~2 if matmul-volume-bound)")
