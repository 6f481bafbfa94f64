"""Column-aligned Pallas TPU band sweep.

The TPU-native re-design of the Tiled HLS kernel
(kernel/MatrixProfileKernelTiled.cpp).  The FPGA builds a systolic chain of
processing elements whose column windows *shift* every row, forwarding
expiring columns down the chain (MatrixProfileKernelTiled.cpp:204-222).
A literal translation would need per-row unaligned vector loads, which is
exactly what the TPU's (8, 128)-tiled memory cannot do.  Instead this
kernel pins every vector lane to a **column** of the join:

* lane ``j`` <-> column ``c0 + j`` for the whole sweep (``c0 = r0 + k0``);
* all column operands (df/dg/inv) and the column aggregates are therefore
  *static* full-width vectors — no window ever moves;
* the only thing that moves is the QT recurrence state: in column
  coordinates ``QT(i, j) = QT(i-1, j-1) + update(i, j)``, i.e. one lane
  rotate per row — implemented for an 8-row block as a single *strided*
  lane rotate (sublane ``s`` rotates by ``s+1``) plus a lower-triangular
  (8 x 8) matmul on the MXU that performs the in-block prefix sum of the
  update terms (the skew/deskew trick);
* out-of-window lanes (expired or not-yet-active diagonals) are exactly
  the lanes the exclusion/window masks kill, so rotate wrap-around
  garbage never reaches an aggregate.

Per 8-row sub-block everything is a full-sublane (8, N) VPU op with
N = W + S lanes; row aggregates reduce over lanes, column aggregates
reduce over sublanes and max-merge into a persistent (1, N) accumulator
that *is* the job's column-profile output — the reference's
expired-column streaming protocol disappears entirely.

Float32 only (Mosaic has no f64 vectors); float64 runs use the XLA
backend via resolve_kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpx.dtypes import AGGREGATE_INIT, INDEX_INIT
from mpx.kernels.common import BandGeometry, BandOut, seed_qt
from mpx.types import Aggregates, Stats

# int32 literals: under x64 bare python ints trace as i64, which Mosaic
# cannot convert or rotate by.
_BIG = np.int32(2**30)
_I0 = np.int32(0)
_I1 = np.int32(1)


def _band_kernel(
    # inputs
    scal_ref,                     # SMEM (4,) int32: [r0, k0, w, excl]
    df_r_ref, dg_r_ref, inv_r_ref,  # SMEM (S,) row statistics
    seedm1_ref,                   # VMEM (1, N) roll(QT(r0, .), -1)
    df_c_ref, dg_c_ref, inv_c_ref,  # VMEM (1, N) column statistics
    # outputs
    row_val_ref, row_idx_ref,     # (RB, 8, NB) blocks (1, 8, NB)
    col_val_ref, col_idx_ref,     # (1, N)
    # scratch
    qt_ref,                       # VMEM (1, N) QT carry between grid steps
    cval_ref, cidx_ref,           # VMEM (1, N) column aggregates
    *,
    geom: BandGeometry,
    dtype,
):
    S, W = geom.S, geom.W
    N = S + W
    tr = geom.tr          # rows per grid step
    NB = tr // 8          # 8-row sub-blocks per grid step
    dt = jnp.dtype(dtype)
    init_v = jnp.asarray(AGGREGATE_INIT, dt)
    rb = pl.program_id(0)
    i0 = rb * tr
    r0 = scal_ref[0]
    k0 = scal_ref[1]
    w = scal_ref[2]
    excl = scal_ref[3]
    c0 = r0 + k0

    @pl.when(rb == 0)
    def _init():
        qt_ref[:] = seedm1_ref[:]
        cval_ref[:] = jnp.full((1, N), init_v, dt)
        cidx_ref[:] = jnp.full((1, N), INDEX_INIT, jnp.int32)

    inv_c = inv_c_ref[:]
    df_c = df_c_ref[:]
    dg_c = dg_c_ref[:]

    col_io = jax.lax.broadcasted_iota(jnp.int32, (8, N), 1)
    row_io = jax.lax.broadcasted_iota(jnp.int32, (8, N), 0)
    sub_io = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    # Static-per-job lane mask: in-bounds columns with finite norms.
    lane_ok = (col_io[0:1] <= (w - 1) - c0) & jnp.isfinite(inv_c)

    # Lower bound on the *local* window offset j - i: the exclusion zone
    # (global diagonal k0 + (j - i) >= excl) clipped at 0.
    elo = jnp.maximum(excl - k0, 0)

    def sub_block(b, carry):
        qt_prev, cval, cidx, acc_v, acc_i = carry
        i_loc = i0 + 8 * b          # first local row of this sub-block
        r_base = r0 + i_loc

        # Row statistics: 8 scalar SMEM reads each (the scalar core runs
        # ahead of the VPU; these are free in the shadow of vector work).
        df_r = jnp.stack([df_r_ref[i_loc + s] for s in range(8)]).reshape(8, 1)
        dg_r = jnp.stack([dg_r_ref[i_loc + s] for s in range(8)]).reshape(8, 1)
        inv_r = jnp.stack([inv_r_ref[i_loc + s] for s in range(8)]).reshape(8, 1)

        # SCAMP update terms; band row 0 uses the seed with no update.
        U = df_r * dg_c + df_c * dg_r
        first = (rb == 0) & (b == 0)
        U = jnp.where(first & (row_io == 0), jnp.zeros_like(U), U)

        # Prefix-sum U along the *diagonal* direction (down-right):
        #   Cs(s, j) = sum_{t<=s} U(t, j - (s - t))
        # via Hillis-Steele with (sublane, lane) shifts of (d, d).  (The
        # skew-matmul-deskew alternative needs a left lane-rotate, and the
        # hardware's strided rotate only supports strides mod 8.)
        Cs = U
        for d in (1, 2, 4):
            shifted = pltpu.roll(pltpu.roll(Cs, np.int32(d), 1), np.int32(d), 0)
            Cs = Cs + jnp.where(row_io >= d, shifted, jnp.zeros_like(shifted))
        # Add the rotated carry: QT(i0+s, j) = QT_prev(j - s - 1) + Cs(s, j)
        QTb = pltpu.roll(
            jnp.broadcast_to(qt_prev, (8, N)), _I1, 1, stride=1, stride_axis=0
        ) + Cs
        qt_prev = QTb[7:8, :]

        P = QTb * inv_r * inv_c

        # Masks: window/exclusion (j - i in [elo, W)), row bounds, finite
        # row norm, NaN guard (0 * inf from zero-variance pairs).
        jm = col_io - (i_loc + sub_io)
        row_ok = ((r_base + sub_io) <= w - 1) & jnp.isfinite(inv_r)
        valid = (jm >= elo) & (jm < W) & row_ok & lane_ok & (P == P)
        Pm = jnp.where(valid, P, init_v)

        # Row aggregates: max + first-occurrence argmax over lanes.
        rv = jnp.max(Pm, axis=1, keepdims=True)                  # (8, 1)
        jloc = jnp.min(
            jnp.where(Pm == rv, col_io, _BIG), axis=1, keepdims=True
        )
        ri = jnp.where(rv > init_v, c0 + jloc, jnp.int32(INDEX_INIT))
        # acc columns <-> sub-blocks: acc[:, b] = (rv, ri)
        bcol = jax.lax.broadcasted_iota(jnp.int32, (8, NB), 1) == b
        acc_v = jnp.where(bcol, rv, acc_v)
        acc_i = jnp.where(bcol, ri, acc_i)

        # Column aggregates: max + first-row argmax over sublanes, merged
        # into the persistent column profile.
        cm = jnp.max(Pm, axis=0, keepdims=True)                  # (1, N)
        sloc = jnp.min(
            jnp.where(Pm == cm, row_io, _BIG), axis=0, keepdims=True
        )
        better = cm > cval
        cval = jnp.where(better, cm, cval)
        cidx = jnp.where(better, r_base + sloc, cidx)

        return qt_prev, cval, cidx, acc_v, acc_i

    carry = (
        qt_ref[:],
        cval_ref[:],
        cidx_ref[:],
        jnp.full((8, NB), init_v, dt),
        jnp.full((8, NB), INDEX_INIT, jnp.int32),
    )
    # int32 bounds keep the induction variable 32-bit under x64 mode
    # (Mosaic has no 64-bit arithmetic).
    qt_prev, cval, cidx, acc_v, acc_i = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(NB), sub_block, carry
    )
    qt_ref[:] = qt_prev
    cval_ref[:] = cval
    cidx_ref[:] = cidx
    row_val_ref[0] = acc_v
    row_idx_ref[0] = acc_i

    @pl.when(rb == pl.num_programs(0) - 1)
    def _emit_cols():
        col_val_ref[:] = cval_ref[:]
        col_idx_ref[:] = cidx_ref[:]


def sweep_band_pallas(
    stats: Stats, r0, k0, geom: BandGeometry, dtype, *, interpret: bool = False
) -> BandOut:
    S, W, m = geom.S, geom.W, geom.m
    tr = geom.tr
    N = S + W
    NB = tr // 8
    RB = S // tr
    dt = jnp.dtype(dtype)
    if dt == jnp.dtype(jnp.float64):
        raise ValueError(
            "pallas kernel is float32-only (Mosaic has no f64 vectors); "
            "use kernel='xla' for float64"
        )
    if tr % 8:
        raise ValueError("tile_rows must be a multiple of 8 for pallas")
    c0 = r0 + k0

    # Job-local operand windows + exact QT seed (conv -> MXU), O(S + W)
    # next to the O(S * W) sweep.  Column-side vectors span the full
    # column window [c0, c0 + N); the seed is pre-rotated by -1 so the
    # kernel's uniform "rotate then add" recurrence reproduces it at row 0.
    df_r = jax.lax.dynamic_slice(stats.df, (r0,), (S,))
    dg_r = jax.lax.dynamic_slice(stats.dg, (r0,), (S,))
    inv_r = jax.lax.dynamic_slice(stats.inv, (r0,), (S,))
    df_c = jax.lax.dynamic_slice(stats.df, (c0,), (N,)).reshape(1, N)
    dg_c = jax.lax.dynamic_slice(stats.dg, (c0,), (N,)).reshape(1, N)
    inv_c = jax.lax.dynamic_slice(stats.inv, (c0,), (N,)).reshape(1, N)
    seed = seed_qt(stats, r0, c0, W, m).astype(dt)
    seed_pad = jnp.concatenate([seed, jnp.zeros((S,), dt)])
    seedm1 = jnp.roll(seed_pad, -1).reshape(1, N)

    scal = jnp.stack(
        [r0, k0, jnp.int32(geom.w), jnp.int32(geom.excl)]
    ).astype(jnp.int32)

    kernel = partial(_band_kernel, geom=geom, dtype=dt)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    # np.int32 literals: x64 mode would make bare-int index components i64,
    # which Mosaic rejects at the index-map function boundary.
    rb_block = lambda: pl.BlockSpec(
        (1, 8, NB), lambda rb: (rb, _I0, _I0), memory_space=pltpu.VMEM
    )
    full_n = lambda: pl.BlockSpec(
        (1, N), lambda rb: (_I0, _I0), memory_space=pltpu.VMEM
    )

    out_shape = (
        jax.ShapeDtypeStruct((RB, 8, NB), dt),
        jax.ShapeDtypeStruct((RB, 8, NB), jnp.int32),
        jax.ShapeDtypeStruct((1, N), dt),
        jax.ShapeDtypeStruct((1, N), jnp.int32),
    )

    row_v, row_i, col_v, col_i = pl.pallas_call(
        kernel,
        grid=(RB,),
        in_specs=[smem, smem, smem, smem, vmem, vmem, vmem, vmem],
        out_specs=(rb_block(), rb_block(), full_n(), full_n()),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((1, N), dt),
            pltpu.VMEM((1, N), dt),
            pltpu.VMEM((1, N), jnp.int32),
        ],
        interpret=interpret,
    )(scal, df_r.astype(dt), dg_r.astype(dt), inv_r.astype(dt),
      seedm1, df_c.astype(dt), dg_c.astype(dt), inv_c.astype(dt))

    # (RB, 8, NB): [rb, s, b] holds row rb*tr + 8b + s.
    row_v = jnp.transpose(row_v, (0, 2, 1)).reshape(S)
    row_i = jnp.transpose(row_i, (0, 2, 1)).reshape(S)
    return BandOut(
        row=Aggregates(row_v, row_i),
        col=Aggregates(col_v.reshape(N), col_i.reshape(N)),
    )
