"""Streaming (incremental) self-join matrix profile.

The reference recomputes from scratch per run; its host aggregate arrays
are the natural incremental state (SURVEY §5).  mpx keeps that state live:
appending ``k`` points costs one rectangle sweep of the ``k + m - 1`` new
subsequences against the whole (updated) series — O(k * n) pairs instead
of O(n^2) — using the same MXU windows-matmul as the batch kernels, with
the self-join exclusion zone applied on global indices.

State is held in Pearson-correlation space (like the device kernels);
distances are materialized on demand.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mpx.dtypes import AGGREGATE_INIT, INDEX_INIT, canonical_dtype
from mpx.kernels.mxu import _windows
from mpx.ops.precompute import precompute_statistics_numpy


@partial(jax.jit, static_argnames=("m", "excl", "S", "W"))
def _rect_sweep(
    Ta, mu_a, inv_a, Tb, mu_b, inv_b, r_off, *, m, excl, S, W
):
    """Correlations of A-windows (global rows r_off + i) against B-windows
    (global cols j), with the self-join exclusion |c - r| < excl.
    Returns row aggregates (S,) and column aggregates (W,)."""
    dt = Ta.dtype
    init_v = jnp.asarray(AGGREGATE_INIT, dt)
    fin_a = jnp.isfinite(inv_a)
    fin_b = jnp.isfinite(inv_b)
    Ua = _windows(Ta, mu_a, jnp.where(fin_a, inv_a, 0), S, m)
    Ub = _windows(Tb, mu_b, jnp.where(fin_b, inv_b, 0), W, m)
    P = jax.lax.dot_general(
        Ua, Ub, (((1,), (1,)), ((), ())),
        preferred_element_type=dt,
        precision=jax.lax.Precision.HIGHEST,
    )
    rows = r_off + jnp.arange(S, dtype=jnp.int32)[:, None]
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]
    valid = (jnp.abs(cols - rows) >= excl) & fin_a[:, None] & fin_b[None, :]
    Pm = jnp.where(valid, P, init_v)

    big = np.int32(2**30)
    rv = jnp.max(Pm, axis=1)
    ri = jnp.min(jnp.where(Pm == rv[:, None], cols, big), axis=1)
    cv = jnp.max(Pm, axis=0)
    ci = jnp.min(jnp.where(Pm == cv[None, :], rows, big), axis=0)
    return rv, ri.astype(jnp.int32), cv, ci.astype(jnp.int32)


class StreamingMatrixProfile:
    """Self-join matrix profile with O(k*n) appends.

    >>> smp = StreamingMatrixProfile(T0, m=64)
    >>> smp.append(new_points)
    >>> MP, MPI = smp.profile()
    """

    def __init__(self, T, m: int, dtype: str = "float32"):
        self.m = m
        self.dtype = canonical_dtype(dtype)
        self._T = np.asarray(T, np.float64).copy()
        if self._T.shape[0] < m + m // 4:
            raise ValueError("initial series too short for a self-join")
        self._excl = m // 4
        # Pearson-space aggregates.
        w = self._T.shape[0] - m + 1
        self._val = np.full(w, AGGREGATE_INIT, dtype=self.dtype)
        self._idx = np.full(w, INDEX_INIT, np.int32)
        s = precompute_statistics_numpy(self._T, m)
        self._mu = s["mu"]
        self._inv = s["inv"]
        self._bootstrap()

    def _extend_stats(self, old_w: int):
        """Statistics for the new windows only: O(k * m) per append
        (existing windows' mu/inv never change).  Uses the centered
        two-pass form, with the same relative zero-variance rule as the
        batch backends."""
        from mpx.ops.precompute import ZERO_VARIANCE_REL

        m = self.m
        w = self._T.shape[0] - m + 1
        win = np.lib.stride_tricks.sliding_window_view(self._T[old_w:], m)
        mu_new = win.mean(axis=1)
        cent = win - mu_new[:, None]
        ssq = np.sum(cent * cent, axis=1)
        sumsq = np.sum(win * win, axis=1)
        ssq = np.where(ssq <= ZERO_VARIANCE_REL * sumsq, 0.0, ssq)
        with np.errstate(divide="ignore"):
            inv_new = 1.0 / np.sqrt(ssq)
        self._mu = np.concatenate([self._mu, mu_new])
        self._inv = np.concatenate([self._inv, inv_new])
        assert self._mu.shape[0] == w

    def _bootstrap(self):
        from mpx.config import MatrixProfileConfig
        from mpx.driver import compute_matrix_profile

        cfg = MatrixProfileConfig(m=self.m, dtype=str(self.dtype))
        MP, MPI = compute_matrix_profile(self._T, config=cfg)
        # Convert distances back to Pearson space for merging:
        # P = 1 - d^2 / (2m).
        d = np.asarray(MP, np.float64)
        self._idx = np.asarray(MPI, np.int32).copy()
        val = 1.0 - (d * d) / (2.0 * self.m)
        self._val = np.where(
            self._idx >= 0, val, AGGREGATE_INIT
        ).astype(self.dtype)

    @property
    def series(self) -> np.ndarray:
        return self._T

    def append(self, points):
        """Append new points; update the profile incrementally."""
        points = np.atleast_1d(np.asarray(points, np.float64))
        k = points.shape[0]
        if k == 0:
            return
        m = self.m
        old_w = self._T.shape[0] - m + 1
        self._T = np.concatenate([self._T, points])
        n = self._T.shape[0]
        w = n - m + 1

        # Incremental statistics: only the new windows (O(k * m)).
        self._extend_stats(old_w)
        dt = self.dtype

        # New rows: subsequences [old_w, w) — every window that contains
        # at least one new point, i.e. starts at old_w or later.
        S = w - old_w            # == k
        r_off = old_w
        Ta = self._T[r_off : r_off + S + m - 1].astype(dt)
        from mpx.dtypes import needs_x64, x64_scope

        with x64_scope(needs_x64(dt)):
            rv, ri, cv, ci = _rect_sweep(
                jnp.asarray(Ta),
                jnp.asarray(self._mu[r_off : r_off + S].astype(dt)),
                jnp.asarray(self._inv[r_off : r_off + S].astype(dt)),
                jnp.asarray(self._T.astype(dt)),
                jnp.asarray(self._mu.astype(dt)),
                jnp.asarray(self._inv.astype(dt)),
                jnp.int32(r_off),
                m=m,
                excl=self._excl,
                S=S,
                W=w,
            )
        rv = np.asarray(rv)
        ri = np.asarray(ri)
        cv = np.asarray(cv)
        ci = np.asarray(ci)

        # Grow the aggregate arrays and merge.
        grown_val = np.full(w, AGGREGATE_INIT, dtype=dt)
        grown_idx = np.full(w, INDEX_INIT, np.int32)
        grown_val[:old_w] = self._val
        grown_idx[:old_w] = self._idx
        grown_val[old_w:] = rv
        grown_idx[old_w:] = ri
        better = cv > grown_val
        self._val = np.where(better, cv, grown_val)
        self._idx = np.where(better, ci, grown_idx)

    def profile(self):
        """Current (MP, MPI) as numpy arrays (reference distance units)."""
        MP = np.sqrt(
            np.maximum(2.0 * self.m * (1.0 - self._val.astype(np.float64)), 0.0)
        )
        return MP, self._idx.copy()
