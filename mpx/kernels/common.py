"""Shared band-sweep kernel contract.

A *job* sweeps a row band ``r0 .. r0+S`` against a diagonal chunk
``k0 .. k0+W`` of the upper-triangular self-join.  Coordinates:

* lane ``j`` of the QT carry tracks diagonal ``k0 + j`` (diagonal-aligned,
  like the reference kernels' QT buffer, kernel/MatrixProfileKernelVanilla.cpp:27);
* at local row ``i`` the lane touches column ``c0 + i + j`` with
  ``c0 = r0 + k0``;
* the column-aggregate carry is column-aligned and therefore *shifts* by
  one lane per row (the reference's double-buffer shift,
  kernel/MatrixProfileKernelVanilla.cpp:92-96); the lane shifted out is the
  **expired** column ``c0 + i``, final for this job;
* after the last row, the surviving window is the **tail**: columns
  ``c0 + S .. c0 + S + W`` that later bands of the same chunk also touch.

Outputs (all (value, index) aggregate pairs):

* ``row``     — (S,)  row aggregates for rows r0..r0+S
* ``expired`` — (S,)  column aggregates for columns c0..c0+S
* ``tail``    — (W,)  column aggregates for columns c0+S..c0+S+W

The driver max-merges these windows into global row/column profiles
(the UpdateAggregates analog), so jobs may be scheduled in any order,
across grid steps or across chips.

Masking rules (per pair (r, c), diag k = c - r):

* in-bounds:      r <= w-1 and c <= w-1   (w = n - m + 1)
* exclusion zone: k >= m // 4             (MatrixProfileReference.hpp:72-79)
* finite stats:   inv[r] and inv[c] finite — zero-variance subsequences
  never match (documented deviation: the reference lets inf/NaN
  correlations poison comparisons for degenerate inputs; mpx skips them).

Masked pairs contribute the aggregate init (-1e12), never 0: the reference
kernels mask with P=0 (kernel/MatrixProfileKernelVanilla.cpp:84), which can
beat genuine negative correlations — a bug mpx does not reproduce.
"""

from __future__ import annotations

from typing import NamedTuple

import jax

from mpx.types import Aggregates


class BandOut(NamedTuple):
    row: Aggregates      # (S,)
    expired: Aggregates  # (S,)
    tail: Aggregates     # (W,)


class BandGeometry(NamedTuple):
    S: int      # band rows
    W: int      # chunk diagonals
    m: int      # subsequence length
    w: int      # profile width n - m + 1
    excl: int   # exclusion zone m // 4


def band_geometry(S: int, W: int, m: int, w: int) -> BandGeometry:
    return BandGeometry(S=S, W=W, m=m, w=w, excl=m // 4)


def seed_qt(stats, r0, c0, W: int, m: int):
    """Exact QT seed for row r0 against columns [c0, c0+W):

    ``QT(r0, c) = SDP(r0, c) - m * mu[r0] * mu[c]`` with SDP the sliding
    dot product of window T[r0:r0+m] against T[c0 : c0+W+m-1].  This closed
    form (a 1-D convolution -> MXU) replaces the reference's row-serial QT
    carry between chunks and makes bands independent."""
    import jax.numpy as jnp
    from mpx.ops.precompute import sliding_dot_product

    q = jax.lax.dynamic_slice(stats.T, (r0,), (m,))
    seg = jax.lax.dynamic_slice(stats.T, (c0,), (W + m - 1,))
    sdp = sliding_dot_product(q, seg)
    mu_r = jax.lax.dynamic_slice(stats.mu, (r0,), (1,))[0]
    mu_c = jax.lax.dynamic_slice(stats.mu, (c0,), (W,))
    return sdp - m * mu_r * mu_c
