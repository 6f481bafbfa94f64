"""Pod-scale self-join with SHARDED inputs (ring schedule over ICI).

``mpx.parallel.sharding`` replicates the statistics to every device —
fine to n ~ 16M f32, but pod-scale series must be sharded.  This module
implements the ring design (the matrix-profile cousin of ring
attention; SURVEY §5 "long-context / sequence parallelism"):

* each device owns one contiguous shard of the subsequence axis: its
  slice of the series (with an m-1 halo), rolling stats, and the
  row-side aggregates for its shard;
* a (column block, column aggregates) bundle rotates around the ring
  via ``ppermute`` for D steps; after D steps every bundle is back at
  its owner with fully-merged column aggregates;
* device d computes on step s only when the unordered block pair
  {d, (d+s) % D} has not been handled elsewhere — the rectangle sweep
  masks |c - r| < excl and emits BOTH row- and column-side aggregates,
  so each pair needs processing exactly once and total compute is the
  fair w^2/(2D) share (+1 diagonal block);
* within a step, the (shard_w x shard_w) rectangle is tiled by an
  inner (band x chunk) job scan, operand panels built on the fly from
  the series shard (no O(w*m) windows materialization — pod-scale
  memory is O(n/D + band*m) per device).

Correctness: every unordered valid pair is covered exactly once, except
the diagonal block where (r, c) and (c, r) are both computed — harmless
for max-merges.  Merges are the same strict-greater semantics as the
batch path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from mpx.dtypes import AGGREGATE_INIT, INDEX_INIT, canonical_dtype
from mpx.parallel.mesh import default_mesh

_BIG = np.int32(2**30)


def _rect_panels(Tseg, mu, inv, count: int, m: int):
    cols = [Tseg[j : j + count] for j in range(m)]
    Wm = jnp.stack(cols, axis=1)
    fin = jnp.isfinite(inv)
    return (Wm - mu[:, None]) * jnp.where(fin, inv, 0)[:, None], fin


def _rect_sweep(Tr, mu_r, inv_r, Tc, mu_c, inv_c, r_goff, c_goff,
                *, w, excl, m, S, W, r0, c0):
    """Sweep local rows [r0, r0+S) x local cols [c0, c0+W) of a block
    pair whose global offsets are (r_goff, c_goff).  Both-sided
    exclusion |c - r| >= excl; returns (row (S,), col (W,)) aggregates."""
    dt = Tr.dtype
    init_v = jnp.asarray(AGGREGATE_INIT, dt)
    Trs = jax.lax.dynamic_slice(Tr, (r0,), (S + m - 1,))
    Tcs = jax.lax.dynamic_slice(Tc, (c0,), (W + m - 1,))
    mu_rs = jax.lax.dynamic_slice(mu_r, (r0,), (S,))
    mu_cs = jax.lax.dynamic_slice(mu_c, (c0,), (W,))
    inv_rs = jax.lax.dynamic_slice(inv_r, (r0,), (S,))
    inv_cs = jax.lax.dynamic_slice(inv_c, (c0,), (W,))
    Ur, fin_r = _rect_panels(Trs, mu_rs, inv_rs, S, m)
    Uc, fin_c = _rect_panels(Tcs, mu_cs, inv_cs, W, m)
    Pm = jax.lax.dot_general(
        Ur, Uc, (((1,), (1,)), ((), ())),
        preferred_element_type=dt,
        precision=jax.lax.Precision.HIGHEST,
    )
    rows = r_goff + r0 + jnp.arange(S, dtype=jnp.int32)[:, None]
    cols = c_goff + c0 + jnp.arange(W, dtype=jnp.int32)[None, :]
    valid = (
        (jnp.abs(cols - rows) >= excl)
        & (rows <= w - 1)
        & (cols <= w - 1)
        & fin_r[:, None]
        & fin_c[None, :]
    )
    Pm = jnp.where(valid, Pm, init_v)
    rv = jnp.max(Pm, axis=1)
    ri = jnp.min(jnp.where(Pm == rv[:, None], cols, _BIG), axis=1)
    ri = jnp.where(rv > init_v, ri.astype(jnp.int32), jnp.int32(INDEX_INIT))
    cv = jnp.max(Pm, axis=0)
    ci = jnp.min(jnp.where(Pm == cv[None, :], rows, _BIG), axis=0)
    ci = jnp.where(cv > init_v, ci.astype(jnp.int32), jnp.int32(INDEX_INIT))
    return rv, ri, cv, ci


def _block_pair(Tr, mu_r, inv_r, Tc, mu_c, inv_c, r_goff, c_goff,
                rowsV, rowsI, colV, colI, *, w, excl, m, S, W, shard_w):
    """All (band x chunk) jobs of one block pair, merged into the
    device-local row aggregates and the traveling column aggregates."""

    nr, nc = shard_w // S, shard_w // W
    jobs_r = (jnp.arange(nr * nc, dtype=jnp.int32) // nc) * S
    jobs_c = (jnp.arange(nr * nc, dtype=jnp.int32) % nc) * W

    def body(carry, job):
        rowsV, rowsI, colV, colI = carry
        r0, c0 = job
        rv, ri, cv, ci = _rect_sweep(
            Tr, mu_r, inv_r, Tc, mu_c, inv_c, r_goff, c_goff,
            w=w, excl=excl, m=m, S=S, W=W, r0=r0, c0=c0,
        )
        curV = jax.lax.dynamic_slice(rowsV, (r0,), (S,))
        curI = jax.lax.dynamic_slice(rowsI, (r0,), (S,))
        win = rv > curV
        rowsV = jax.lax.dynamic_update_slice(rowsV, jnp.where(win, rv, curV), (r0,))
        rowsI = jax.lax.dynamic_update_slice(rowsI, jnp.where(win, ri, curI), (r0,))
        curV = jax.lax.dynamic_slice(colV, (c0,), (W,))
        curI = jax.lax.dynamic_slice(colI, (c0,), (W,))
        win = cv > curV
        colV = jax.lax.dynamic_update_slice(colV, jnp.where(win, cv, curV), (c0,))
        colI = jax.lax.dynamic_update_slice(colI, jnp.where(win, ci, curI), (c0,))
        return (rowsV, rowsI, colV, colI), None

    (rowsV, rowsI, colV, colI), _ = jax.lax.scan(
        body, (rowsV, rowsI, colV, colI), (jobs_r, jobs_c)
    )
    return rowsV, rowsI, colV, colI


def run_ring_sharded(
    T,
    m: int,
    *,
    num_shards: int,
    band: int = 4096,
    chunk: int = 4096,
    dtype: str = "float32",
    mesh=None,
    host_stats: dict | None = None,
    compile_only: bool = False,
):
    """Self-join with inputs sharded over a 1-D mesh (ring schedule).

    Returns (MP, MPI) numpy arrays.  Per-device memory is
    O(n/num_shards + band*m); nothing is replicated."""
    from mpx.ops.precompute import precompute_statistics_numpy

    D = num_shards
    T = np.asarray(T, np.float64)
    n = T.shape[0]
    w = n - m + 1
    excl = m // 4
    dt = canonical_dtype(dtype)
    if dt == np.dtype(np.float64):
        raise NotImplementedError(
            "ring sharding is float32 (use the hybrid tier for double)"
        )

    if host_stats is None:
        from mpx import native

        host_stats = (
            native.precompute(T, m) if native.is_available()
            else precompute_statistics_numpy(T, m)
        )

    # per-device shard width: a multiple of both tile sizes
    shard_w = int(np.ceil(w / (D * band)) * band)
    shard_w = max(shard_w, chunk)
    if shard_w % chunk:
        shard_w = int(np.ceil(shard_w / chunk) * chunk)
    if shard_w % band:
        shard_w = int(np.ceil(shard_w / band) * band)
    padded_w = shard_w * D

    # Explicit (D, shard) layouts with the m-1 series halo duplicated.
    Tb = np.zeros((D, shard_w + m - 1), dt)
    mub = np.zeros((D, shard_w), dt)
    invb = np.zeros((D, shard_w), dt)
    Tpad = np.zeros(padded_w + m - 1, np.float64)
    Tpad[:n] = T
    for d in range(D):
        o = d * shard_w
        Tb[d] = Tpad[o : o + shard_w + m - 1].astype(dt)
        sl = host_stats["mu"][o : o + shard_w]
        mub[d, : sl.shape[0]] = sl.astype(dt)
        sl = host_stats["inv"][o : o + shard_w]
        invb[d, : sl.shape[0]] = sl.astype(dt)

    if mesh is None:
        mesh = default_mesh(D)
    S = min(band, shard_w)
    W = min(chunk, shard_w)

    def local(T_blk, mu_blk, inv_blk):
        d = jax.lax.axis_index("jobs")
        T_blk, mu_blk, inv_blk = T_blk[0], mu_blk[0], inv_blk[0]  # (L,) locals
        rowsV = jnp.full((shard_w,), AGGREGATE_INIT, dt)
        rowsI = jnp.full((shard_w,), INDEX_INIT, jnp.int32)
        # the traveling bundle: column block + its aggregates
        carry0 = (
            T_blk, mu_blk, inv_blk,
            jnp.full((shard_w,), AGGREGATE_INIT, dt),
            jnp.full((shard_w,), INDEX_INIT, jnp.int32),
            rowsV, rowsI,
        )
        perm = [(i, (i - 1) % D) for i in range(D)]

        def step(s, carry):
            cT, cMu, cInv, cV, cI, rV, rI = carry
            b = (d + s) % D
            # compute iff this unordered block pair {d, b} is ours this
            # round: the diagonal, the first floor((D-1)/2) rotations,
            # or (even D) the antipodal rotation on the lower half only
            half = D // 2
            mine = (s == 0) | ((s >= 1) & (s <= (D - 1) // 2))
            if D % 2 == 0:
                mine = mine | ((s == half) & (d < half))

            def do(_):
                return _block_pair(
                    T_blk, mu_blk, inv_blk, cT, cMu, cInv,
                    d * shard_w, b * shard_w,
                    rV, rI, cV, cI,
                    w=w, excl=excl, m=m, S=S, W=W, shard_w=shard_w,
                )

            nrV, nrI, ncV, ncI = jax.lax.cond(
                mine, do, lambda _: (rV, rI, cV, cI), None
            )
            out = jax.lax.ppermute((cT, cMu, cInv, ncV, ncI), "jobs", perm)
            return (*out, nrV, nrI)

        cT, cMu, cInv, cV, cI, rV, rI = jax.lax.fori_loop(
            0, D, step, carry0
        )
        # after D rotations the column bundle is home: merge sides
        better = cV > rV
        outV = jnp.where(better, cV, rV)
        outI = jnp.where(better, cI, rI)
        return outV[None], outI[None]

    shard_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("jobs"), P("jobs"), P("jobs")),
        out_specs=P("jobs"),
        check_vma=False,
    )

    with mesh:
        fn = jax.jit(shard_fn)
        if compile_only:
            # pod-scale configs (n=16M+) are validated for compilation
            # on virtual meshes where executing them would take hours
            fn.lower(Tb, mub, invb).compile()
            return None, None
        V, I = fn(Tb, mub, invb)
    V = np.asarray(V).reshape(-1)[:w]
    I = np.asarray(I).reshape(-1)[:w]
    MP = np.sqrt(np.maximum(2.0 * m * (1.0 - V.astype(np.float64)), 0.0))
    return MP, I
