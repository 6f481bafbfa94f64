"""AB-join: matrix profile of series A against series B.

The reference implements the self-join only; the SCAMP algorithm family
also defines the AB-join (for every subsequence of A, the nearest
neighbor among subsequences of B — no trivial-match exclusion zone).
mpx adds it on the MXU kernel: a job is a rectangle of A-rows x B-cols,
one normalized-windows matmul per job, with row aggregates forming the
A->B profile and column aggregates the B->A profile (both sides of the
join come out of one sweep).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mpx.config import MatrixProfileConfig
from mpx.dtypes import AGGREGATE_INIT, INDEX_INIT, canonical_dtype, needs_x64, x64_scope
from mpx.kernels.mxu import _windows
from mpx.ops.aggregates import (
    init_aggregates,
    merge_window,
    pearson_to_euclidean,
)
from mpx.ops.precompute import precompute_statistics
from mpx.types import Aggregates, Stats


class ABJoinResult(NamedTuple):
    mp_a: jax.Array   # (wa,) distance of each A-subsequence to nearest B
    mpi_a: jax.Array  # (wa,) index into B
    mp_b: jax.Array   # (wb,) distance of each B-subsequence to nearest A
    mpi_b: jax.Array  # (wb,) index into A


def _sweep_ab(stats_a: Stats, stats_b: Stats, r0, c0, *, S, W, m, wa, wb, dt):
    init_v = jnp.asarray(AGGREGATE_INIT, dt)

    Ta = jax.lax.dynamic_slice(stats_a.T, (r0,), (S + m - 1,))
    Tb = jax.lax.dynamic_slice(stats_b.T, (c0,), (W + m - 1,))
    mu_a = jax.lax.dynamic_slice(stats_a.mu, (r0,), (S,))
    mu_b = jax.lax.dynamic_slice(stats_b.mu, (c0,), (W,))
    inv_a = jax.lax.dynamic_slice(stats_a.inv, (r0,), (S,))
    inv_b = jax.lax.dynamic_slice(stats_b.inv, (c0,), (W,))
    fin_a = jnp.isfinite(inv_a)
    fin_b = jnp.isfinite(inv_b)
    Ua = _windows(Ta, mu_a, jnp.where(fin_a, inv_a, 0), S, m).astype(dt)
    Ub = _windows(Tb, mu_b, jnp.where(fin_b, inv_b, 0), W, m).astype(dt)

    P = jax.lax.dot_general(
        Ua, Ub, (((1,), (1,)), ((), ())),
        preferred_element_type=dt,
        precision=jax.lax.Precision.HIGHEST,
    )

    rows = r0 + jnp.arange(S, dtype=jnp.int32)[:, None]
    cols = c0 + jnp.arange(W, dtype=jnp.int32)[None, :]
    valid = (
        (rows <= wa - 1) & (cols <= wb - 1) & fin_a[:, None] & fin_b[None, :]
    )
    Pm = jnp.where(valid, P, init_v)

    big = np.int32(2**30)
    row_v = jnp.max(Pm, axis=1)
    ri = jnp.min(jnp.where(Pm == row_v[:, None], cols, big), axis=1)
    row_i = jnp.where(row_v > init_v, ri.astype(jnp.int32), jnp.int32(INDEX_INIT))
    col_v = jnp.max(Pm, axis=0)
    ci = jnp.min(jnp.where(Pm == col_v[None, :], rows, big), axis=0)
    col_i = jnp.where(col_v > init_v, ci.astype(jnp.int32), jnp.int32(INDEX_INIT))
    return Aggregates(row_v, row_i), Aggregates(col_v, col_i)


@partial(
    jax.jit, static_argnames=("S", "W", "m", "wa", "wb", "dtype")
)
def _run_ab_jobs(stats_a, stats_b, r0s, c0s, *, S, W, m, wa, wb, dtype):
    dt = canonical_dtype(dtype)
    rows0 = init_aggregates(wa + S, dt, AGGREGATE_INIT)
    cols0 = init_aggregates(wb + W, dt, AGGREGATE_INIT)

    def body(carry, job):
        rows, cols = carry
        r0, c0 = job
        ra, cb = _sweep_ab(
            stats_a, stats_b, r0, c0, S=S, W=W, m=m, wa=wa, wb=wb, dt=dt
        )
        rows = merge_window(rows, ra, r0)
        cols = merge_window(cols, cb, c0)
        return (rows, cols), None

    (rows, cols), _ = jax.lax.scan(body, (rows0, cols0), (r0s, c0s))
    return rows, cols


def compute_ab_join(
    A,
    B,
    m: Optional[int] = None,
    config: Optional[MatrixProfileConfig] = None,
    *,
    profile=None,
) -> ABJoinResult:
    """Full AB-join: returns both directional profiles (A->B and B->A)."""
    if config is None:
        config = MatrixProfileConfig(m=m if m is not None else 32)
    elif m is not None and m != config.m:
        raise ValueError(f"m={m} conflicts with config.m={config.m}")
    m = config.m

    if config.input_quant is not None:
        # ap_fixed input tier (see mpx/io/apfixed.py): quantize both
        # sides before any compute routing.
        from mpx.io.apfixed import quantize

        A = quantize(np.asarray(A), config.input_quant)
        B = quantize(np.asarray(B), config.input_quant)

    # double-precision AB-joins route to the hybrid tier (f32 MXU sweeps
    # + exact host-f64 rescoring); kernel='mxu' forces the strict
    # emulated-f64 device path.
    if (
        canonical_dtype(config.dtype) == np.dtype(np.float64)
        and config.kernel in ("auto", "hybrid")
    ):
        from mpx.hybrid import compute_ab_join_f64_hybrid

        return compute_ab_join_f64_hybrid(A, B, config, profile=profile)

    A = np.asarray(A) if not isinstance(A, jax.Array) else A
    B = np.asarray(B) if not isinstance(B, jax.Array) else B
    config.validate_series(A.shape[0], A)
    config.validate_series(B.shape[0], B)
    wa = A.shape[0] - m + 1
    wb = B.shape[0] - m + 1
    config = config.shrink_to(max(wa, wb))
    S, W = config.band, config.chunk
    dt = canonical_dtype(config.dtype)

    from mpx.utils.profile import phase as _phase

    with _phase(profile, "1. Pre-Computation [device]"):
        stats_a = precompute_statistics(A, m, band=S, chunk=W, dtype=dt)
        stats_b = precompute_statistics(B, m, band=S, chunk=W, dtype=dt)

    r0s, c0s = [], []
    for r0 in range(0, wa, S):
        for c0 in range(0, wb, W):
            r0s.append(r0)
            c0s.append(c0)

    with _phase(profile, "2. Compute [mxu, ab-join]"), x64_scope(needs_x64(dt)):
        rows, cols = _run_ab_jobs(
            stats_a,
            stats_b,
            jnp.asarray(np.asarray(r0s, np.int32)),
            jnp.asarray(np.asarray(c0s, np.int32)),
            S=S,
            W=W,
            m=m,
            wa=wa,
            wb=wb,
            dtype=str(dt),
        )
        mp_a = pearson_to_euclidean(rows.value[:wa], m)
        mp_b = pearson_to_euclidean(cols.value[:wb], m)
        out = ABJoinResult(
            mp_a=mp_a,
            mpi_a=rows.index[:wa],
            mp_b=mp_b,
            mpi_b=cols.index[:wb],
        )
        jax.block_until_ready(out)
    return out


def brute_force_ab_join(A, B, m: int):
    """Independent numpy oracle for tests: explicit z-normalized distances
    between every A window and every B window."""
    from mpx.reference import rolling_statistics

    A = np.asarray(A, np.float64)
    B = np.asarray(B, np.float64)
    mu_a, _, _, inv_a = rolling_statistics(A, m)
    mu_b, _, _, inv_b = rolling_statistics(B, m)
    Za = (np.lib.stride_tricks.sliding_window_view(A, m) - mu_a[:, None]) * inv_a[:, None]
    Zb = (np.lib.stride_tricks.sliding_window_view(B, m) - mu_b[:, None]) * inv_b[:, None]
    D = np.sqrt(np.maximum(2.0 * m * (1.0 - Za @ Zb.T), 0.0))
    D = np.where(np.isnan(D), np.inf, D)
    return (
        D.min(axis=1),
        D.argmin(axis=1).astype(np.int32),
        D.min(axis=0),
        D.argmin(axis=0).astype(np.int32),
    )
