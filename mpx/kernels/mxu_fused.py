"""Fused Pallas MXU band sweep: matmul + masked argmax epilogue in VMEM.

The XLA ``mxu`` kernel materializes each (S x W) correlation block in HBM
and reads it back for the reductions — ~12 bytes/pair of HBM traffic that
caps it near 3.5e10 pairs/s.  This kernel keeps the whole epilogue
on-chip:

* the column panel ``Uc (W, m)`` stays resident in VMEM for the kernel's
  lifetime; row panels ``Ur (TI, m)`` stream in per grid step —
  HBM traffic drops to ~(S + W) * m * 4 bytes per S*W pairs;
* per (TI, TJ) tile: one MXU ``dot`` and a short VPU epilogue
  (exclusion/bounds masks, row max/argmax accumulated across column
  tiles, column max/argmax merged into a persistent (1, W) scratch);
* correlations never leave VMEM — only the (value, index) aggregates do.

Float32 only (like the Tiled HLS kernel this is the performance build;
float64 runs use the XLA backends).  Same BandOut job contract as
kernels/mxu.py: rectangle rows [r0, r0+S) x columns [c0, c0+W).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpx.dtypes import AGGREGATE_INIT, INDEX_INIT
from mpx.kernels.common import BandGeometry, BandOut
from mpx.types import Aggregates, Stats

_BIG = np.int32(2**30)
_I0 = np.int32(0)

# Resident column-panel budget (bytes); jobs whose W*m*4 exceeds this
# should use the unfused mxu kernel instead.
UC_VMEM_BUDGET = 8 << 20


def _pick_tile(extent: int, candidates) -> int:
    for c in candidates:
        if extent % c == 0:
            return c
    return extent


def _kernel(
    scal_ref,                    # SMEM (4,): r0, k0, w, excl
    ur_ref,                      # (TI, m) row panel block
    fr_ref,                      # (TI,) finite-row mask (f32 0/1)
    uc_ref,                      # (W, m) resident column panel
    fc_ref,                      # (1, W) finite-col mask
    row_val_ref, row_idx_ref,    # (TI,) blocks by i
    col_val_ref, col_idx_ref,    # (1, W)
    cval_ref, cidx_ref,          # scratch (1, W)
    *,
    S: int,
    W: int,
    m: int,
    TI: int,
    TJ: int,
    dtype,
):
    dt = jnp.dtype(dtype)
    init_v = jnp.asarray(AGGREGATE_INIT, dt)
    i = pl.program_id(0)
    r0 = scal_ref[0]
    k0 = scal_ref[1]
    w = scal_ref[2]
    excl = scal_ref[3]
    c0 = r0 + k0

    @pl.when(i == 0)
    def _init():
        cval_ref[:] = jnp.full((1, W), init_v, dt)
        cidx_ref[:] = jnp.full((1, W), INDEX_INIT, jnp.int32)

    rows = (r0 + i * TI) + jax.lax.broadcasted_iota(jnp.int32, (TI, TJ), 0)
    col_base = jax.lax.broadcasted_iota(jnp.int32, (TI, TJ), 1)
    row_ok = (rows[:, 0:1] <= w - 1) & (fr_ref[:].reshape(TI, 1) > 0)

    ur = ur_ref[:]

    def tile(j, carry):
        acc_v, acc_i = carry
        o = pl.multiple_of(j * TJ, TJ)
        uc = uc_ref[pl.ds(o, TJ), :]
        # HIGHEST: Mosaic's default f32 matmul multiplies in bfloat16.
        P = jax.lax.dot_general(
            ur, uc, (((1,), (1,)), ((), ())),
            preferred_element_type=dt,
            precision=jax.lax.Precision.HIGHEST,
        )

        cols = (c0 + o) + col_base
        fc = fc_ref[0:1, pl.ds(o, TJ)]
        valid = (
            (cols - rows >= excl)
            & (cols <= w - 1)
            & row_ok
            & (fc > 0)
        )
        Pm = jnp.where(valid, P, init_v)

        # Row aggregates: running max/argmax across column tiles.
        rv = jnp.max(Pm, axis=1, keepdims=True)
        jloc = jnp.min(jnp.where(Pm == rv, cols, _BIG), axis=1, keepdims=True)
        better = rv > acc_v
        acc_v = jnp.where(better, rv, acc_v)
        acc_i = jnp.where(better, jloc, acc_i)

        # Column aggregates: tile max/argmax merged into the persistent
        # (1, W) scratch window.
        cm = jnp.max(Pm, axis=0, keepdims=True)
        sloc = jnp.min(jnp.where(Pm == cm, rows, _BIG), axis=0, keepdims=True)
        sl = pl.ds(o, TJ)
        old_v = cval_ref[0:1, sl]
        old_i = cidx_ref[0:1, sl]
        cb = cm > old_v
        cval_ref[0:1, sl] = jnp.where(cb, cm, old_v)
        cidx_ref[0:1, sl] = jnp.where(cb, sloc, old_i)
        return acc_v, acc_i

    acc_v, acc_i = jax.lax.fori_loop(
        jnp.int32(0),
        jnp.int32(W // TJ),
        tile,
        (
            jnp.full((TI, 1), init_v, dt),
            jnp.full((TI, 1), INDEX_INIT, jnp.int32),
        ),
    )

    row_val_ref[:] = acc_v.reshape(TI)
    row_idx_ref[:] = jnp.where(
        acc_v[:, 0] > init_v, acc_i[:, 0], jnp.int32(INDEX_INIT)
    )

    @pl.when(i == pl.num_programs(0) - 1)
    def _emit():
        col_val_ref[:] = cval_ref[:]
        col_idx_ref[:] = cidx_ref[:]


def sweep_band_mxu_fused(
    stats: Stats, r0, k0, geom: BandGeometry, dtype, *, interpret: bool = False
) -> BandOut:
    S, W, m, w = geom.S, geom.W, geom.m, geom.w
    dt = jnp.dtype(dtype)
    if dt == jnp.dtype(jnp.float64):
        raise ValueError("mxu_fused is float32-only; use kernel='mxu' for f64")
    if W * m * 4 > UC_VMEM_BUDGET:
        raise ValueError(
            f"chunk {W} x m {m} column panel exceeds the VMEM budget; "
            f"reduce chunk or use kernel='mxu'"
        )
    # Rank-1 blocked operands (row masks/outputs) must match XLA's
    # T(1024) tile layout for f32 vectors, so row blocks are 1024 rows
    # (or the whole band when it is smaller/unaligned).
    TI = 1024 if S % 1024 == 0 else S
    TJ = _pick_tile(W, (256, 128))
    c0 = r0 + k0

    from mpx.kernels.mxu import _windows

    Tr = jax.lax.dynamic_slice(stats.T, (r0,), (S + m - 1,))
    Tc = jax.lax.dynamic_slice(stats.T, (c0,), (W + m - 1,))
    mu_r = jax.lax.dynamic_slice(stats.mu, (r0,), (S,))
    mu_c = jax.lax.dynamic_slice(stats.mu, (c0,), (W,))
    inv_r = jax.lax.dynamic_slice(stats.inv, (r0,), (S,))
    inv_c = jax.lax.dynamic_slice(stats.inv, (c0,), (W,))
    fin_r = jnp.isfinite(inv_r)
    fin_c = jnp.isfinite(inv_c)
    Ur = _windows(Tr, mu_r, jnp.where(fin_r, inv_r, 0), S, m).astype(dt)
    Uc = _windows(Tc, mu_c, jnp.where(fin_c, inv_c, 0), W, m).astype(dt)

    scal = jnp.stack(
        [r0, k0, jnp.int32(geom.w), jnp.int32(geom.excl)]
    ).astype(jnp.int32)
    fr = jnp.where(fin_r, 1.0, 0.0).astype(dt)
    fc = jnp.where(fin_c, 1.0, 0.0).astype(dt).reshape(1, W)

    kernel = partial(_kernel, S=S, W=W, m=m, TI=TI, TJ=TJ, dtype=dt)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    grid = (S // TI,)
    out_shape = (
        jax.ShapeDtypeStruct((S,), dt),
        jax.ShapeDtypeStruct((S,), jnp.int32),
        jax.ShapeDtypeStruct((1, W), dt),
        jax.ShapeDtypeStruct((1, W), jnp.int32),
    )
    row_blk = lambda: pl.BlockSpec((TI,), lambda i: (i,), memory_space=pltpu.VMEM)
    full_w = lambda: pl.BlockSpec((1, W), lambda i: (_I0, _I0), memory_space=pltpu.VMEM)

    row_v, row_i, col_v, col_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            smem,
            pl.BlockSpec((TI, m), lambda i: (i, _I0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TI,), lambda i: (i,), memory_space=pltpu.VMEM),
            vmem,
            vmem,
        ],
        out_specs=(row_blk(), row_blk(), full_w(), full_w()),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((1, W), dt),
            pltpu.VMEM((1, W), jnp.int32),
        ],
        interpret=interpret,
    )(scal, Ur, fr, Uc, fc)

    return BandOut(
        row=Aggregates(row_v, row_i),
        col=Aggregates(col_v.reshape(W), col_i.reshape(W)),
    )
