"""MXU band sweep: the correlation block as a windows matmul.

The Pearson correlation of two z-normalized subsequences is a dot
product: with ``u_i = (T[i:i+m] - mu_i) * inv_i`` (unit-normalized
windows), ``P(r, c) = u_r . u_c``.  A whole (S x W) tile of the join is
therefore ONE matmul ``U_r @ U_c^T`` on the MXU — where a TPU's FLOPs
actually live.  Compared to the SCAMP O(1) diagonal recurrence this does
``2m`` FLOPs per pair instead of ~10, but the MXU:VPU throughput ratio
(~100x at f32) makes it the fastest kernel for the reference's m range
(the recurrence kernels remain for very large m and for the protocol
analogy with the HLS design).

No recurrence also means no seeding, better numerics (errors are
~sqrt(m) ulps of an O(1) result — no QT drift over rows), and pure-XLA
portability (CPU/TPU, f32/f64).

Same job contract as the other backends (BandOut), except the job is the
*rectangle* rows [r0, r0+S) x columns [c0, c0+W) rather than a diagonal
rhombus, so the column output covers (W,) at offset c0.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from mpx.dtypes import AGGREGATE_INIT, INDEX_INIT
from mpx.kernels.common import BandGeometry, BandOut
from mpx.types import Aggregates, Stats

# f32 matmul precision on TPU: HIGHEST = 6-pass bf16 (full f32 products),
# HIGH = 3-pass (f32-grade for this use; ~2x faster).  Overridable for
# experiments via MPX_MXU_PRECISION.
_PRECISION = getattr(
    jax.lax.Precision, os.environ.get("MPX_MXU_PRECISION", "HIGHEST")
)


def _windows(Tseg: jax.Array, mu, inv, count: int, m: int):
    """Unit-normalized window matrix (count, m) from a series segment of
    length count + m - 1 via m static shifted slices (no gather)."""
    cols = [Tseg[j : j + count] for j in range(m)]
    Wm = jnp.stack(cols, axis=1)
    return (Wm - mu[:, None]) * inv[:, None]


def _panel(stats: Stats, o, count: int, m: int):
    """Unit-normalized window panel (count, m) at offset ``o`` plus the
    finite (non-degenerate) mask."""
    inv = jax.lax.dynamic_slice(stats.inv, (o,), (count,))
    # Zero-variance windows have inv = inf; their operand rows are zeroed
    # (masked by callers) so inf/NaN never enters the matmul.
    fin = jnp.isfinite(inv)
    if stats.windows is not None:
        # Slice the precomputed normalized-windows matrix (saves the
        # per-job window construction; see Stats.windows).
        zero = np.int32(0)  # bare 0 traces as i64 under x64 scope
        U = jax.lax.dynamic_slice(stats.windows, (o, zero), (count, m))
    else:
        Tseg = jax.lax.dynamic_slice(stats.T, (o,), (count + m - 1,))
        mu = jax.lax.dynamic_slice(stats.mu, (o,), (count,))
        U = _windows(Tseg, mu, jnp.where(fin, inv, 0), count, m)
    return U, fin


def _job_correlations(stats: Stats, r0, c0, geom: BandGeometry, dt,
                      stats_c: Stats | None = None):
    """The shared (S x W) correlation tile: unit-window panels -> MXU
    matmul -> validity mask.  Returns (P, valid, rows, cols).

    ``stats_c`` selects a different statistics set for the column axis
    (AB-joins: rows from A, columns from B; geom.excl < 0 and geom.wc
    carry the AB semantics).  Default: self-join."""
    S, W, m, w, excl = geom.S, geom.W, geom.m, geom.w, geom.excl
    Ur, fin_r = _panel(stats, r0, S, m)
    Uc, fin_c = _panel(stats if stats_c is None else stats_c, c0, W, m)

    # HIGHEST precision: the TPU default would multiply f32 in bfloat16,
    # far outside the distance tolerance.
    P = jax.lax.dot_general(
        Ur,
        Uc,
        (((1,), (1,)), ((), ())),
        preferred_element_type=dt,
        precision=_PRECISION,
    )

    rows = r0 + jnp.arange(S, dtype=jnp.int32)[:, None]
    cols = c0 + jnp.arange(W, dtype=jnp.int32)[None, :]
    valid = (
        (cols - rows >= excl)
        & (rows <= w - 1)
        & (cols <= geom.wc - 1)
        & fin_r[:, None]
        & fin_c[None, :]
    )
    return P, valid, rows, cols


def sweep_band_mxu(stats: Stats, r0, k0, geom: BandGeometry, dtype) -> BandOut:
    S, W = geom.S, geom.W
    dt = jnp.dtype(dtype)
    init_v = jnp.asarray(AGGREGATE_INIT, dt)
    c0 = r0 + k0
    P, valid, rows, cols = _job_correlations(stats, r0, c0, geom, dt)
    Pm = jnp.where(valid, P, init_v)

    # max + first-occurrence index via an iota-min over the tie mask.
    # XLA fuses the mask/eq/where into the reduction reads; this measures
    # ~40% faster end-to-end than jnp.argmax + gather on TPU (argmax
    # lowers poorly along the minor axis).  Tie-break = smallest index =
    # argmax's first-occurrence semantics.
    big = np.int32(2**30)
    row_v = jnp.max(Pm, axis=1)
    ri = jnp.min(jnp.where(Pm == row_v[:, None], cols, big), axis=1)
    row_i = jnp.where(row_v > init_v, ri.astype(jnp.int32), jnp.int32(INDEX_INIT))
    col_v = jnp.max(Pm, axis=0)
    ci = jnp.min(jnp.where(Pm == col_v[None, :], rows, big), axis=0)
    col_i = jnp.where(col_v > init_v, ci.astype(jnp.int32), jnp.int32(INDEX_INIT))
    return BandOut(
        row=Aggregates(row_v, row_i),
        col=Aggregates(col_v, col_i),
    )


def sweep_band_max(stats: Stats, r0, k0, geom: BandGeometry, dtype,
                   stats_c: Stats | None = None):
    """Value-only band sweep: per-row and per-column max correlation,
    no argmax.  Pass A of the hybrid tier needs only the maxima (to set
    the suspect threshold); dropping the two tie-index reductions saves
    HBM epilogue traffic.  Returns ((S,) row maxes, (W,) col maxes)."""
    dt = jnp.dtype(dtype)
    init_v = jnp.asarray(AGGREGATE_INIT, dt)
    c0 = r0 + k0
    P, valid, _, _ = _job_correlations(stats, r0, c0, geom, dt, stats_c)
    Pm = jnp.where(valid, P, init_v)
    return jnp.max(Pm, axis=1), jnp.max(Pm, axis=0)


# Sentinels for suspect-index capture (min-merged / max-merged).
SUSPECT_MIN_INIT = np.int32(2**30)
SUSPECT_MAX_INIT = np.int32(-1)


class SuspectWindow(NamedTuple):
    """Per-subsequence suspect summary over one job's rows or columns:
    how many valid pairs reach the caller-provided correlation threshold,
    plus the two smallest and two largest neighbor indices among them.
    All five fields merge associatively across jobs (sum / min / max),
    so the captured set is exact whenever the global count is <= 4."""

    cnt: jax.Array  # (k,) int32 number of suspects
    mn1: jax.Array  # (k,) int32 smallest suspect index (SUSPECT_MIN_INIT if none)
    mn2: jax.Array  # (k,) int32 second smallest
    mx1: jax.Array  # (k,) int32 largest (SUSPECT_MAX_INIT if none)
    mx2: jax.Array  # (k,) int32 second largest


class SuspectOut(NamedTuple):
    row: SuspectWindow  # (S,)  subsequences r0 .. r0+S, suspects among columns
    col: SuspectWindow  # (W,)  subsequences c0 .. c0+W, suspects among rows


def _suspect_reduce(mask, idx, axis) -> SuspectWindow:
    cnt = jnp.sum(mask, axis=axis, dtype=jnp.int32)
    lo = jnp.where(mask, idx, SUSPECT_MIN_INIT)
    hi = jnp.where(mask, idx, SUSPECT_MAX_INIT)
    mn1 = jnp.min(lo, axis=axis)
    mx1 = jnp.max(hi, axis=axis)
    mn1k = jnp.expand_dims(mn1, axis)
    mx1k = jnp.expand_dims(mx1, axis)
    mn2 = jnp.min(jnp.where(idx == mn1k, SUSPECT_MIN_INIT, lo), axis=axis)
    mx2 = jnp.max(jnp.where(idx == mx1k, SUSPECT_MAX_INIT, hi), axis=axis)
    return SuspectWindow(cnt, mn1, mn2, mx1, mx2)


def sweep_band_suspects(
    stats: Stats, r0, k0, geom: BandGeometry, dtype, thr: jax.Array,
    stats_c: Stats | None = None, thr_col: jax.Array | None = None,
) -> SuspectOut:
    """Stage-2 sweep of the hybrid double tier: recompute the f32
    correlation tile and summarize, per subsequence, every pair whose
    correlation reaches ``thr`` (its global f32 maximum minus the hybrid
    margin).  The job grid covers each valid pair exactly once (see
    mpx.config.make_job_grid), so counts sum correctly across jobs.

    AB-joins pass ``stats_c``/``thr_col`` for the column (target) axis;
    self-joins use one statistics set and one threshold array."""
    dt = jnp.dtype(dtype)
    c0 = r0 + k0
    S, W = geom.S, geom.W
    P, valid, rows, cols = _job_correlations(stats, r0, c0, geom, dt, stats_c)
    thr_r = jax.lax.dynamic_slice(thr, (r0,), (S,))
    thr_c = jax.lax.dynamic_slice(
        thr if thr_col is None else thr_col, (c0,), (W,)
    )
    hit_r = valid & (P >= thr_r[:, None])
    hit_c = valid & (P >= thr_c[None, :])
    bcols = jnp.broadcast_to(cols, (S, W))
    brows = jnp.broadcast_to(rows, (S, W))
    return SuspectOut(
        row=_suspect_reduce(hit_r, bcols, axis=1),
        col=_suspect_reduce(hit_c, brows, axis=0),
    )
