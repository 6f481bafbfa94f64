"""Streaming (incremental) self-join matrix profile.

The reference recomputes from scratch per run; its host aggregate arrays
are the natural incremental state (SURVEY §5).  mpx keeps that state live
ON DEVICE: appending ``k`` points costs one rectangle sweep of the new
subsequences against the whole series — O(k * n) pairs instead of O(n^2)
— using the same MXU windows-matmul as the batch kernels.

Scaling design (everything here exists to make appends O(k), not O(n)):

* series/statistics/aggregates live in padded device arrays of capacity
  ``cap`` (a power of two, doubled on overflow) — appends transfer only
  the new points and their O(k*m) host-computed statistics;
* the sweep is compiled for (append-bucket, capacity) shape pairs only:
  ``k`` is padded to the next append bucket and the true extents are
  dynamic operands, so a long stream of single-point appends reuses ONE
  executable (plus one per capacity doubling);
* aggregates merge on device inside the same executable; nothing O(n)
  crosses the host boundary until ``profile()`` is called.

State is held in Pearson-correlation space (like the device kernels);
distances are materialized on demand.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mpx.dtypes import AGGREGATE_INIT, INDEX_INIT, canonical_dtype

_MIN_BUCKET = 64


def _bucket(k: int) -> int:
    b = _MIN_BUCKET
    while b < k:
        b *= 2
    return b


@partial(jax.jit, static_argnames=("m", "excl", "S", "cap", "mode"))
def _append_step(
    T_dev, mu_dev, inv_dev, val_dev, idx_dev,
    new_T, new_mu, new_inv, r_off, w, *, m, excl, S, cap, mode="full"
):
    """One device-resident append: write the new tail, sweep the S_pad
    new rows against all ``cap`` columns (true extents masked via the
    dynamic ``r_off``/``w`` scalars), and merge aggregates in place.

    Static shapes: S (append bucket) and cap (capacity) only — a stream
    of same-bucket appends reuses one executable."""
    dt = T_dev.dtype
    init_v = jnp.asarray(AGGREGATE_INIT, dt)

    # Write the new points / stats into the padded device state.
    T_dev = jax.lax.dynamic_update_slice(T_dev, new_T, (r_off,))
    mu_dev = jax.lax.dynamic_update_slice(mu_dev, new_mu, (r_off,))
    inv_dev = jax.lax.dynamic_update_slice(inv_dev, new_inv, (r_off,))

    fin_a_raw = jnp.isfinite(new_inv)
    rows_l = jnp.arange(S, dtype=jnp.int32)
    live_a = (r_off + rows_l) <= w - 1  # rows beyond the true width are pad
    fin_a = fin_a_raw & live_a
    Ta = jax.lax.dynamic_slice(T_dev, (r_off,), (S + m - 1,))
    mu_a = new_mu

    def windows(seg, mu, invc, count):
        cols = [seg[j : j + count] for j in range(m)]
        Wm = jnp.stack(cols, axis=1)
        return (Wm - mu[:, None]) * invc[:, None]

    Ua = windows(Ta, mu_a, jnp.where(fin_a, new_inv, 0), S)

    cols_g = jnp.arange(cap, dtype=jnp.int32)
    fin_b = jnp.isfinite(inv_dev) & (cols_g <= w - 1)
    Ub = windows(T_dev, mu_dev, jnp.where(fin_b, inv_dev, 0), cap)

    P = jax.lax.dot_general(
        Ua, Ub, (((1,), (1,)), ((), ())),
        preferred_element_type=dt,
        precision=jax.lax.Precision.HIGHEST,
    )
    rows = r_off + rows_l[:, None]
    cols = cols_g[None, :]
    fin = fin_a[:, None] & fin_b[None, :]
    if mode == "right":
        # one-directional (FLOSS) state: a new row's own neighbors lie
        # to its RIGHT (cols - rows >= excl), while it can only improve
        # columns to its LEFT (rows - cols >= excl) — two masked views
        # of the same panel instead of the symmetric |cols - rows| one
        valid_row = ((cols - rows) >= excl) & fin
        valid_col = ((rows - cols) >= excl) & fin
    elif mode == "left":
        # left-profile (DAMP) state: a new row's neighbors lie to its
        # LEFT (earlier windows, including earlier rows of this same
        # append batch).  Existing columns never improve — a new window
        # is later than every existing one, so it cannot become anyone's
        # nearest EARLIER neighbor — which is what makes the online left
        # profile append-stable (scored values are final when emitted).
        valid_row = ((rows - cols) >= excl) & fin
        valid_col = jnp.zeros_like(fin)
    else:
        valid_row = valid_col = (jnp.abs(cols - rows) >= excl) & fin
    Pr = jnp.where(valid_row, P, init_v)
    Pc = jnp.where(valid_col, P, init_v)

    big = np.int32(2**30)
    rv = jnp.max(Pr, axis=1)
    ri = jnp.min(jnp.where(Pr == rv[:, None], cols, big), axis=1).astype(jnp.int32)
    cv = jnp.max(Pc, axis=0)
    ci = jnp.min(jnp.where(Pc == cv[None, :], rows, big), axis=0).astype(jnp.int32)

    # New rows own their aggregate slots; columns max-merge globally.
    ri = jnp.where(rv > init_v, ri, jnp.int32(INDEX_INIT))
    val_dev = jax.lax.dynamic_update_slice(val_dev, rv, (r_off,))
    idx_dev = jax.lax.dynamic_update_slice(idx_dev, ri, (r_off,))
    better = cv > val_dev
    val_dev = jnp.where(better, cv, val_dev)
    idx_dev = jnp.where(better, ci, idx_dev)
    return T_dev, mu_dev, inv_dev, val_dev, idx_dev


class StreamingMatrixProfile:
    """Self-join matrix profile with O(k*n) appends.

    >>> smp = StreamingMatrixProfile(T0, m=64)
    >>> smp.append(new_points)
    >>> MP, MPI = smp.profile()
    """

    def __init__(self, T, m: int, dtype: str = "float32",
                 mode: str = "full"):
        from mpx.ops.precompute import precompute_statistics_numpy

        if mode not in ("full", "right", "left"):
            raise ValueError("mode must be 'full', 'right', or 'left'")
        self.m = m
        self.mode = mode
        self.dtype = canonical_dtype(dtype)
        self._T = np.asarray(T, np.float64).copy()
        if self._T.shape[0] < m + m // 4:
            raise ValueError("initial series too short for a self-join")
        self._excl = m // 4
        # stream position of self._T[0] / window 0 (advanced by trim_head)
        self.offset = 0
        s = precompute_statistics_numpy(self._T, m)
        self._mu = s["mu"]
        self._inv = s["inv"]
        # instrumentation: executable count and per-append staging volume
        self.compile_keys: set = set()
        self.staged_elements: int = 0
        self._bootstrap()

    # -- host-side bookkeeping -------------------------------------------

    @property
    def _w(self) -> int:
        return self._T.shape[0] - self.m + 1

    def _extend_stats(self, old_w: int):
        """Statistics for the new windows only: O(k * m) per append
        (existing windows' mu/inv never change).  Uses the centered
        two-pass form, with the same relative zero-variance rule as the
        batch backends."""
        from mpx.ops.precompute import ZERO_VARIANCE_REL

        m = self.m
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
        assert self._mu.shape[0] == self._w
        return mu_new, inv_new

    def _bootstrap(self):
        from mpx.config import MatrixProfileConfig
        from mpx.driver import compute_matrix_profile

        cfg = MatrixProfileConfig(m=self.m, dtype=str(self.dtype))
        if self.dtype == np.dtype(np.float64):
            # the streaming state is device-resident; stay on the strict
            # device kernels (the hybrid tier returns host arrays)
            cfg = MatrixProfileConfig(m=self.m, dtype="float64", kernel="mxu")
        if self.mode in ("right", "left"):
            MPl, MPIl, MPr, MPIr = compute_matrix_profile(
                self._T, config=cfg, left_right=True
            )
            MP, MPI = (MPr, MPIr) if self.mode == "right" else (MPl, MPIl)
        else:
            MP, MPI = compute_matrix_profile(self._T, config=cfg)
        d = np.asarray(MP, np.float64)
        idx = np.asarray(MPI, np.int32)
        # Convert distances back to Pearson space for merging:
        # P = 1 - d^2 / (2m).
        val = np.where(idx >= 0, 1.0 - (d * d) / (2.0 * self.m), AGGREGATE_INIT)
        self._init_device_state(val.astype(self.dtype), idx)

    def _init_device_state(self, val: np.ndarray, idx: np.ndarray,
                           min_cap: int = 0):
        """(Re)build the padded device arrays at the next capacity."""
        from mpx.dtypes import needs_x64, x64_scope

        w = self._w
        cap = _bucket(max(w, min_cap, 1024))
        self._cap = cap
        dt = self.dtype
        m = self.m

        def pad(x, width, fill=0.0, dtype=dt):
            out = np.full(width, fill, dtype=dtype)
            out[: x.shape[0]] = x
            return out

        with x64_scope(needs_x64(dt)):
            self._T_dev = jnp.asarray(pad(self._T.astype(dt), cap + m - 1))
            self._mu_dev = jnp.asarray(pad(self._mu.astype(dt), cap))
            self._inv_dev = jnp.asarray(pad(self._inv.astype(dt), cap))
            self._val_dev = jnp.asarray(pad(val, cap, fill=AGGREGATE_INIT))
            self._idx_dev = jnp.asarray(
                pad(idx, cap, fill=INDEX_INIT, dtype=np.int32)
            )
        self.staged_elements += 4 * cap + m - 1

    @property
    def series(self) -> np.ndarray:
        return self._T

    def append(self, points):
        """Append new points; update the profile incrementally.

        Transfers O(k + m) elements and reuses one compiled executable
        per (append-bucket, capacity) pair."""
        from mpx.dtypes import needs_x64, x64_scope

        points = np.atleast_1d(np.asarray(points, np.float64))
        k = points.shape[0]
        if k == 0:
            return
        m = self.m
        old_w = self._w
        old_n = self._T.shape[0]
        self._T = np.concatenate([self._T, points])
        w = self._w

        mu_new, inv_new = self._extend_stats(old_w)
        dt = self.dtype

        S = _bucket(k)
        if old_w + S > self._cap:
            # capacity overflow (including the padded append bucket, so
            # the in-place update slice never clamps): rebuild at the
            # next power of two (amortized); aggregates come back from
            # device once
            val = np.asarray(self._val_dev[:old_w])
            idx = np.asarray(self._idx_dev[:old_w])
            self._init_device_state(
                np.concatenate([val, np.full(w - old_w, AGGREGATE_INIT, dt)]),
                np.concatenate([idx, np.full(w - old_w, INDEX_INIT, np.int32)]),
                min_cap=old_w + S,
            )
        r_off = old_w
        # the new tail of the series: the k new points plus the m-1
        # points before them (they complete the first new window)
        seg = self._T[old_n - (m - 1):].astype(dt)

        def padv(x, width, fill=0.0):
            out = np.full(width, fill, dtype=dt)
            out[: x.shape[0]] = x
            return out

        new_T = padv(seg, S + m - 1)
        new_mu = padv(self._mu[old_w:].astype(dt), S)
        # pad inv with 0 (finite) — pad rows are masked by the dynamic
        # width; pad COLUMNS beyond w-1 are masked in fin_b
        new_inv = padv(self._inv[old_w:].astype(dt), S)
        self.staged_elements += (S + m - 1) + 2 * S
        self.compile_keys.add((S, self._cap, str(dt)))

        with x64_scope(needs_x64(dt)):
            # new_T must land at position old_n - (m-1) = r_off in T_dev?
            # T_dev index of the segment start: old_n - (m - 1) == r_off + 0
            # because r_off = old_w = old_n - m + 1.
            out = _append_step(
                self._T_dev, self._mu_dev, self._inv_dev,
                self._val_dev, self._idx_dev,
                jnp.asarray(new_T), jnp.asarray(new_mu), jnp.asarray(new_inv),
                jnp.int32(r_off), jnp.int32(w),
                m=m, excl=self._excl, S=S, cap=self._cap,
                mode=self.mode,
            )
        (self._T_dev, self._mu_dev, self._inv_dev,
         self._val_dev, self._idx_dev) = out

    def trim_head(self, drop: int):
        """Drop the ``drop`` oldest points (= the ``drop`` oldest
        windows) and rebase the state — the sliding-window egress step.

        Only valid in ``mode='right'``: right arcs point from older to
        newer windows, so discarding the head can never orphan a
        surviving window's neighbor (the bidirectional profile has no
        such property — an old window may BE a survivor's nearest
        neighbor, so trimming it would require a recompute).  Costs one
        O(n - drop) device restage; callers amortize by trimming with
        slack (see :class:`mpx.floss.Floss`).  ``self.offset`` keeps
        absolute stream positions recoverable."""
        if self.mode != "right":
            raise ValueError(
                "trim_head requires mode='right' (bidirectional arcs may "
                "point at the discarded head)"
            )
        if drop <= 0:
            return
        w = self._w
        if self._T.shape[0] - drop < self.m + self._excl:
            raise ValueError(
                f"trim_head({drop}) would leave fewer than m + m//4 = "
                f"{self.m + self._excl} points of the current {self._T.shape[0]}"
            )
        val = np.asarray(self._val_dev[drop:w])
        idx = np.asarray(self._idx_dev[drop:w]).astype(np.int64)
        idx = np.where(idx >= 0, idx - drop, idx).astype(np.int32)
        self._T = self._T[drop:]
        self._mu = self._mu[drop:]
        self._inv = self._inv[drop:]
        self.offset += drop
        self._init_device_state(val, idx)

    def row_values(self, lo: int, hi: int):
        """Distances for window slots [lo, hi) only — an O(hi-lo)
        device fetch (profile() transfers the whole width; per-append
        consumers like the DAMP scorer must not pay O(n) per step).
        Slots are LOCAL (post-trim); add ``self.offset`` for stream
        positions."""
        lo = max(0, lo)
        hi = min(hi, self._w)
        if hi <= lo:
            return np.zeros(0, np.float64)
        val = np.asarray(self._val_dev[lo:hi], np.float64)
        return np.sqrt(np.maximum(2.0 * self.m * (1.0 - val), 0.0))

    def profile(self):
        """Current (MP, MPI) as numpy arrays (reference distance units)."""
        w = self._w
        val = np.asarray(self._val_dev[:w], np.float64)
        MP = np.sqrt(np.maximum(2.0 * self.m * (1.0 - val), 0.0))
        return MP, np.asarray(self._idx_dev[:w], np.int32)
