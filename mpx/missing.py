"""Missing-data (NaN/inf gap) support.

The reference computes garbage on non-finite input (its FileIO does no
validation — include/FileIO.hpp:28-42 — and one NaN poisons every QT
recurrence crossing it); mpx's default contract therefore REJECTS
non-finite series up front (mpx/config.py:validate_series).  Real
deployments have gaps, so this tier implements the standard masked
semantics (as popularized by stumpy): every window that overlaps a
non-finite sample is excluded from the join on BOTH sides — it reports
the untouched sentinel (dist sqrt(2m(1+1e12)), index -1, exactly like a
zero-variance window) and can never be another window's neighbor.

Why this is exact, not approximate: gap samples are filled with 0 and
the windows overlapping them are marked degenerate (``inv = inf``, the
framework's existing zero-variance marker that every kernel's finite
mask already honors).  A GOOD window contains no filled positions, so
its mu/inv and its QT dot products against other good windows are
identical on the filled series — the fill value only flows through
excluded windows' (masked) lanes and through QT-recurrence
intermediates, which are algebraically exact for the filled series.

Routing note: statistics are injected via the driver's ``stats=`` hook,
which the fused small-n and hybrid tiers do not take — masked runs use
the standard job path (f64 via the strict kernels).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from mpx.config import MatrixProfileConfig


def missing_window_mask(T, m: int) -> np.ndarray:
    """Boolean (w,) mask: True where window [i, i+m) overlaps a
    non-finite sample."""
    T = np.asarray(T, np.float64)
    bad = (~np.isfinite(T)).astype(np.int64)
    cs = np.concatenate([[0], np.cumsum(bad)])
    return (cs[m:] - cs[:-m]) > 0


def compute_matrix_profile_masked(
    T,
    m: Optional[int] = None,
    config: Optional[MatrixProfileConfig] = None,
    *,
    profile=None,
    left_right: bool = False,
) -> tuple:
    """Self-join matrix profile of a series WITH gaps: ``(MP, MPI)``,
    or the 4-tuple ``(MP_left, MPI_left, MP_right, MPI_right)`` with
    ``left_right=True``.

    Finite input short-circuits to the standard driver (all tiers).
    Otherwise windows overlapping a gap are excluded from both sides of
    the join and report the untouched sentinel; all other values match
    the gap-free semantics exactly (see module docstring).
    """
    from mpx.driver import compute_matrix_profile
    from mpx.ops.precompute import (
        precompute_statistics,
        precompute_statistics_numpy,
    )

    if config is None:
        config = MatrixProfileConfig(m=m if m is not None else 32)
    elif m is not None and m != config.m:
        raise ValueError(f"m={m} conflicts with config.m={config.m}")
    m = config.m

    T = np.asarray(T, np.float64)
    finite = np.isfinite(T)
    if finite.all():
        return compute_matrix_profile(
            T, config=config, profile=profile, left_right=left_right)

    n = T.shape[0]
    if config.input_quant is not None:
        raise ValueError(
            "ap_fixed input tiers cannot carry gaps (the quantizer "
            "range-checks every sample); fill or drop gaps first"
        )
    if config.shard_mode == "ring":
        raise ValueError(
            "masked gaps do not support shard_mode='ring' (the ring "
            "tier restages statistics internally and would rejoin gap "
            "windows); use the default 'jobs' sharding"
        )
    config.validate_series(n)  # shape checks only (T has known gaps)
    w = n - m + 1
    bad = missing_window_mask(T, m)
    if bad.all():
        raise ValueError(
            "every window overlaps a gap — no joinable subsequences "
            f"(n={n}, m={m}, {int((~finite).sum())} non-finite samples)"
        )
    T_fill = np.where(finite, T, 0.0)

    # stage statistics through the driver's stats hook with the gap
    # windows pre-marked degenerate; mirror the driver's schedule shrink
    # so the padded widths agree
    config = config.shrink_to(w)
    from mpx.dtypes import canonical_dtype

    s = precompute_statistics_numpy(T_fill, m)
    with np.errstate(divide="ignore"):
        s["inv"] = np.where(bad, np.inf, s["inv"])
    stats = precompute_statistics(
        T_fill, m, band=config.band, chunk=config.chunk,
        dtype=canonical_dtype(config.dtype), host_stats=s,
    )
    return compute_matrix_profile(
        T_fill, config=config, stats=stats, profile=profile,
        left_right=left_right,
    )
