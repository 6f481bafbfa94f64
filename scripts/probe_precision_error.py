"""Measure the worst f32-sweep error |P32 - P64| per matmul precision.

The hybrid double tier's correctness rests on margin >= max|P32 - P64|
over every valid pair (mpx/hybrid.py docstring).  This probe samples
rows of the self-join, computes their full correlation rows on device
at each jax.lax.Precision, and compares against exact host f64 — on a
random walk (the benchmark distribution) and on a smooth sine+drift
series (worst case: plateaus, near-1 correlations).

Usage: MPX_MXU_PRECISION=HIGH python scripts/probe_precision_error.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def series(kind: str, n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if kind == "walk":
        return np.cumsum(rng.standard_normal(n))
    if kind == "smooth":
        t = np.arange(n)
        return (
            np.sin(2 * np.pi * t / 512)
            + 0.3 * np.sin(2 * np.pi * t / 77)
            + 1e-3 * t
            + 0.01 * rng.standard_normal(n)
        )
    raise ValueError(kind)


def main():
    import jax
    import jax.numpy as jnp

    from mpx.ops.precompute import precompute_statistics, precompute_statistics_numpy
    from mpx.runtime import enable_compilation_cache

    enable_compilation_cache()
    n = 1 << 16
    nrows = 384

    def device_rows(U, rows, precision):
        @jax.jit
        def f(U, rows):
            return jax.lax.dot_general(
                U[rows], U, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=getattr(jax.lax.Precision, precision),
            )
        return f(U, rows)

    for kind in ("walk", "smooth"):
        for m in (64, 256, 512):
            T = series(kind, n, seed=7)
            w = n - m + 1
            stats = precompute_statistics(T, m, band=4096, chunk=4096,
                                          dtype="float32")
            s64 = precompute_statistics_numpy(np.asarray(T, np.float64), m)
            rng = np.random.default_rng(1)
            rows = np.sort(rng.choice(w, nrows, replace=False)).astype(np.int32)

            win = np.lib.stride_tricks.sliding_window_view(
                np.asarray(T, np.float64), m
            )
            cent = win - s64["mu"][:, None]
            inv = s64["inv"]
            fin = np.isfinite(inv)
            Pr = (cent[rows] @ cent.T) * np.where(fin, inv, 0)[None, :]
            Pr *= np.where(fin[rows], inv[rows], 0)[:, None]
            ok = fin[None, :w] & fin[rows][:, None]

            for precision in ("HIGHEST", "HIGH"):
                P32 = np.asarray(
                    device_rows(stats.windows, jnp.asarray(rows), precision)
                )[:, :w]
                err = np.abs(np.where(ok, P32 - Pr[:, :w], 0.0))
                print(
                    f"{kind:7s} m={m:5d} {precision:8s} "
                    f"max|P32-P64|={err.max():.3e}  "
                    f"p99.99={np.quantile(err, 0.9999):.3e}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
