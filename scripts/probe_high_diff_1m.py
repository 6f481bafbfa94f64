"""Measure max |P(HIGH) - P(HIGHEST)| over EVERY valid pair of the 1M
showcase self-join (5.5e11 pairs), on device.

Rationale: sampled-row probes (probe_precision_error.py) put HIGH's
error vs f64 at ~2e-5, but the hybrid margin must bound the WORST pair
of the full join — tails over 5.5e11 pairs historically run ~20x beyond
a 25M-pair sample (HIGHEST: 9.8e-7 sampled vs 2.4e-5 full-run).  This
probe measures the 3-pass-vs-6-pass gap exhaustively; combined with the
HIGHEST-vs-f64 bound it calibrates margin(HIGH).

Run: python scripts/probe_high_diff_1m.py [log2_n]
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from mpx.config import make_job_grid
    from mpx.kernels import band_geometry
    from mpx.kernels.mxu import _job_correlations
    from mpx.ops.precompute import precompute_statistics
    from mpx.runtime import enable_compilation_cache

    enable_compilation_cache()
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
    m = 256
    S, W = 4096, 16384
    T = np.cumsum(np.random.default_rng(0).standard_normal(n))
    w = n - m + 1
    stats = precompute_statistics(T, m, band=S, chunk=W, dtype="float32")
    jax.block_until_ready(stats.mu)
    geom = band_geometry(S, W, m, w, 8, 2048)
    grid = make_job_grid(w, S, W)

    @partial(jax.jit, static_argnames=("prec",))
    def job_p(st, r0, k0, prec):
        import mpx.kernels.mxu as mxu

        old = mxu._PRECISION
        mxu._PRECISION = getattr(jax.lax.Precision, prec)
        try:
            P, valid, _, _ = _job_correlations(st, r0, r0 + k0, geom,
                                               jnp.float32)
        finally:
            mxu._PRECISION = old
        return P, valid

    @jax.jit
    def group(st, r0s, k0s):
        def body(mx, job):
            r0, k0 = job
            Ph, vh = job_p(st, r0, k0, "HIGH")
            Px, _ = job_p(st, r0, k0, "HIGHEST")
            d = jnp.max(jnp.where(vh, jnp.abs(Ph - Px), 0.0))
            return jnp.maximum(mx, d), None

        return jax.lax.scan(body, jnp.float32(0), (r0s, k0s))[0]

    t0 = time.time()
    # dispatch in slices to stay watchdog-safe
    mx = 0.0
    B = 512
    for o in range(0, grid.r0.shape[0], B):
        g = group(
            stats,
            jnp.asarray(grid.r0[o : o + B]),
            jnp.asarray(grid.k0[o : o + B]),
        )
        mx = max(mx, float(g))
        print(f"jobs {o}..{o + B}: running max diff {mx:.3e}", flush=True)
    print(f"n={n}: max |P(HIGH)-P(HIGHEST)| = {mx:.3e}  "
          f"({time.time() - t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
