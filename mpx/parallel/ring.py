"""Pod-scale self-join with SHARDED inputs (ring schedule over ICI).

``mpx.parallel.sharding`` replicates the statistics to every device —
fine to n ~ 16M f32, but pod-scale series must be sharded.  This module
implements the ring design (the matrix-profile cousin of ring
attention; SURVEY §5 "long-context / sequence parallelism"):

* each device owns one contiguous shard of the subsequence axis: its
  slice of the series (with an m-1 halo), rolling stats, and the
  row-side aggregates for its shard;
* a (column block, column state) bundle rotates around the ring via
  ``ppermute`` for ⌊D/2⌋ steps; each step, a device sweeps the full
  (shard_w x shard_w) rectangle of one unordered shard pair {d, b},
  emitting BOTH row- and column-side results, so every pair of shards
  is processed exactly once and the ring only travels half-way (the
  final column states are sent home with one extra ppermute);
* the diagonal shard pair (a self-join of the shard) runs before the
  rotation with the standard upper-triangle job grid;
* per-device operand panels (the unit-normalized windows of the local
  shard, and of the visiting column block) are built ONCE per shard /
  per rotation step with the blockwise builder — never inside the job
  scan.  Round-2's per-job panel construction dominated the runtime
  (~50x off the job path); with prebuilt panels the inner jobs are the
  same panel-slice + MXU matmul as the single-chip kernel
  (mpx.kernels.mxu._panel).

Two tiers share this machinery:

* ``run_ring_sharded``        — one-pass float32 max/argmax profile;
* ``run_ring_hybrid_f64``     — the exact double tier: ring pass A
  (value-only maxima) -> suspect thresholds -> ring pass B (dense
  suspect sweep) -> exact host-f64 rescoring, with a sharded pass C
  (each device scans its own columns for the overflow rows).  Same
  evidence structure as mpx.hybrid; reference flagship analog:
  /root/reference/README.md:35 (double 1M showcase) generalized to
  sharded inputs.

Per-device memory is O(n/D * m / itemsize) for the two panels — the
price of never rebuilding operands per job.  The O(n^2) sweep dwarfs
the O(n m / D) panel builds for every practical geometry.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from mpx.dtypes import AGGREGATE_INIT, INDEX_INIT, canonical_dtype
from mpx.kernels import band_geometry
from mpx.parallel.mesh import default_mesh
from mpx.types import Stats

_BIG = np.int32(2**30)

# Per-device panel budget (bytes) for the two (shard_w, m) operand
# panels; exceeding it means the shard is too wide for this device
# count (use more shards — that is what sharded inputs are for).
RING_PANEL_BUDGET = int(os.environ.get("MPX_RING_PANEL_BUDGET", 10 << 30))


def _panel_block(shard_w: int) -> int:
    blk = 8192
    while shard_w % blk:
        blk //= 2
    return max(blk, 1)


def _build_panel(Tseg, mu, inv, L: int, m: int):
    """Unit-normalized window panel (L, m) from a series segment of
    length L + m - 1, built blockwise (one big stack blows the compile;
    same construction as mpx.ops.precompute.build_windows)."""
    invc = jnp.where(jnp.isfinite(inv), inv, 0)
    blk = _panel_block(L)

    def build(seg, mu_b, iv_b, count):
        Wm = jnp.stack([seg[j : j + count] for j in range(m)], axis=1)
        return (Wm - mu_b[:, None]) * iv_b[:, None]

    if L <= 2 * blk or blk < 512:
        return build(Tseg, mu, invc, L)

    def blk_fn(i):
        o = i * blk
        seg = jax.lax.dynamic_slice(Tseg, (o,), (blk + m - 1,))
        mu_b = jax.lax.dynamic_slice(mu, (o,), (blk,))
        iv_b = jax.lax.dynamic_slice(invc, (o,), (blk,))
        return build(seg, mu_b, iv_b, blk)

    out = jax.lax.map(blk_fn, jnp.arange(L // blk, dtype=jnp.int32))
    return out.reshape(L, m)


def _local_stats(panel, inv, T, mu) -> Stats:
    """A device-local Stats view over a prebuilt panel: the mxu sweeps
    slice ``windows`` and mask by ``inv`` finiteness; the remaining
    fields are unused by the matmul kernels."""
    dummy = jnp.zeros((1,), panel.dtype)
    return Stats(T=T, mu=mu, df=dummy, dg=dummy, inv=inv, qt0=dummy,
                 windows=panel)


def _shard_layout(w: int, D: int, band: int, chunk: int):
    """Per-device shard width: a multiple of both job tile sizes."""
    shard_w = int(np.ceil(w / (D * band)) * band)
    shard_w = max(shard_w, chunk)
    if shard_w % chunk:
        shard_w = int(np.ceil(shard_w / chunk) * chunk)
    if shard_w % band:
        shard_w = int(np.ceil(shard_w / band) * band)
    return shard_w


def _stage_shards(T64, host_stats, w: int, m: int, D: int, shard_w: int, dt):
    """Explicit (D, shard) input layouts with the m-1 series halo
    duplicated; pads beyond w are masked by the global bounds checks."""
    Tb = np.zeros((D, shard_w + m - 1), dt)
    mub = np.zeros((D, shard_w), dt)
    invb = np.zeros((D, shard_w), dt)
    Tpad = np.zeros(D * shard_w + m - 1, np.float64)
    Tpad[: T64.shape[0]] = T64
    for d in range(D):
        o = d * shard_w
        Tb[d] = Tpad[o : o + shard_w + m - 1].astype(dt)
        sl = host_stats["mu"][o : o + shard_w]
        mub[d, : sl.shape[0]] = sl.astype(dt)
        sl = host_stats["inv"][o : o + shard_w]
        invb[d, : sl.shape[0]] = sl.astype(dt)
    return Tb, mub, invb


def _ring_grids(shard_w: int, S: int, W: int):
    """(diag upper-triangle jobs, off-diagonal rectangle jobs), static."""
    from mpx.config import make_job_grid

    g = make_job_grid(shard_w, S, W)
    diag = (jnp.asarray(g.r0), jnp.asarray(g.k0))
    nr, nc = shard_w // S, shard_w // W
    idx = np.arange(nr * nc, dtype=np.int32)
    r0 = (idx // nc) * S
    c0 = (idx % nc) * W
    rect = (jnp.asarray(r0), jnp.asarray(c0 - r0))  # k0 = c0 - r0
    return diag, rect


def _check_budget(shard_w: int, m: int, itemsize: int = 4):
    need = 2 * shard_w * m * itemsize
    if need > RING_PANEL_BUDGET:
        raise ValueError(
            f"ring operand panels need {need / 2**30:.1f} GiB/device "
            f"(shard_w={shard_w}, m={m}); raise num_shards or "
            f"MPX_RING_PANEL_BUDGET"
        )


def run_ring_sharded(
    T,
    m: int,
    *,
    num_shards: int,
    band: int = 4096,
    chunk: int = 16384,
    dtype: str = "float32",
    mesh=None,
    host_stats: dict | None = None,
    compile_only: bool = False,
    precision: str | None = None,
):
    """One-pass float32 self-join with inputs sharded over a 1-D mesh.

    Returns (MP, MPI) numpy arrays.  Per-device memory is
    O(n/num_shards * (m + 1)); nothing is replicated.  ``precision``
    overrides the f32 matmul precision (default: the mxu kernel's
    HIGHEST, i.e. full-f32 products).  float64 requests should use
    :func:`run_ring_hybrid_f64` (the driver routes there)."""
    from mpx.kernels.mxu import _PRECISION, sweep_band_mxu
    from mpx.ops.precompute import precompute_statistics_numpy

    D = num_shards
    T64 = np.asarray(T, np.float64)
    n = T64.shape[0]
    w = n - m + 1
    excl = m // 4
    dt = canonical_dtype(dtype)
    if dt == np.dtype(np.float64):
        raise NotImplementedError(
            "one-pass ring sharding is float32; float64 rings run the "
            "exact hybrid tier (run_ring_hybrid_f64)"
        )
    prec = _PRECISION if precision is None else getattr(
        jax.lax.Precision, precision
    )

    if host_stats is None:
        from mpx import native

        host_stats = (
            native.precompute(T64, m) if native.is_available()
            else precompute_statistics_numpy(T64, m)
        )

    shard_w = _shard_layout(w, D, band, chunk)
    _check_budget(shard_w, m)
    Tb, mub, invb = _stage_shards(T64, host_stats, w, m, D, shard_w, dt)
    if mesh is None:
        mesh = default_mesh(D)
    S = min(band, shard_w)
    W = min(chunk, shard_w)
    geom = band_geometry(S, W, m, w, 8, min(2048, W))
    (diag_r0, diag_k0), (rect_r0, rect_k0) = _ring_grids(shard_w, S, W)
    init_v = jnp.asarray(AGGREGATE_INIT, dt)
    s_final = D // 2

    def block_jobs(st_r, st_c, r0s, k0s, rg, cg, two_sided,
                   rowsV, rowsI, colV, colI):
        def body(carry, job):
            rowsV, rowsI, colV, colI = carry
            r0, k0 = job
            out = sweep_band_mxu(
                st_r, r0, k0, geom, dt, stats_c=st_c, precision=prec,
                rg=rg, cg=cg, two_sided=two_sided,
            )
            c0 = r0 + k0
            # Row merge at the local band offset.
            curV = jax.lax.dynamic_slice(rowsV, (r0,), (S,))
            curI = jax.lax.dynamic_slice(rowsI, (r0,), (S,))
            win = out.row.value > curV
            rowsV = jax.lax.dynamic_update_slice(
                rowsV, jnp.where(win, out.row.value, curV), (r0,))
            rowsI = jax.lax.dynamic_update_slice(
                rowsI, jnp.where(win, out.row.index, curI), (r0,))
            # Column merge: sweep_band_mxu's col window spans S + W
            # columns starting at c0; clamp to the shard via a padded
            # local view is avoided by merging only the leading W lanes
            # for rectangle jobs (their column extent is exactly W).
            cv = out.col.value[:W]
            ci = out.col.index[:W]
            curV = jax.lax.dynamic_slice(colV, (c0,), (W,))
            curI = jax.lax.dynamic_slice(colI, (c0,), (W,))
            win = cv > curV
            colV = jax.lax.dynamic_update_slice(
                colV, jnp.where(win, cv, curV), (c0,))
            colI = jax.lax.dynamic_update_slice(
                colI, jnp.where(win, ci, curI), (c0,))
            return (rowsV, rowsI, colV, colI), None

        (rowsV, rowsI, colV, colI), _ = jax.lax.scan(
            body, (rowsV, rowsI, colV, colI), (r0s, k0s)
        )
        return rowsV, rowsI, colV, colI

    def local(T_blk, mu_blk, inv_blk):
        d = jax.lax.axis_index("jobs")
        T_blk, mu_blk, inv_blk = T_blk[0], mu_blk[0], inv_blk[0]
        goff = d.astype(jnp.int32) * shard_w
        Ur = _build_panel(T_blk, mu_blk, inv_blk, shard_w, m)
        st_r = _local_stats(Ur, inv_blk, T_blk, mu_blk)

        rowsV = jnp.full((shard_w,), init_v, dt)
        rowsI = jnp.full((shard_w,), INDEX_INIT, jnp.int32)
        colV = jnp.full((shard_w,), init_v, dt)
        colI = jnp.full((shard_w,), INDEX_INIT, jnp.int32)

        # Diagonal shard pair: a self-join of the shard (upper-triangle
        # job grid, one-sided exclusion — each unordered pair once).
        rowsV, rowsI, colV, colI = block_jobs(
            st_r, None, diag_r0, diag_k0, goff, goff, False,
            rowsV, rowsI, colV, colI,
        )

        if D == 1:
            better = colV > rowsV
            return (jnp.where(better, colV, rowsV)[None],
                    jnp.where(better, colI, rowsI)[None])

        perm = [(i, (i - 1) % D) for i in range(D)]

        def step(s, carry):
            cT, cMu, cInv, cV, cI, rV, rI = carry
            cT, cMu, cInv, cV, cI = jax.lax.ppermute(
                (cT, cMu, cInv, cV, cI), "jobs", perm
            )
            b = (d + s) % D
            mine = s <= (D - 1) // 2
            if D % 2 == 0:
                mine = mine | ((s == D // 2) & (d < D // 2))

            def do(args):
                cT, cMu, cInv, cV, cI, rV, rI = args
                Uc = _build_panel(cT, cMu, cInv, shard_w, m)
                st_c = _local_stats(Uc, cInv, cT, cMu)
                return block_jobs(
                    st_r, st_c, rect_r0, rect_k0,
                    goff, b.astype(jnp.int32) * shard_w, True,
                    rV, rI, cV, cI,
                )

            rV, rI, cV, cI = jax.lax.cond(
                mine, do, lambda a: (a[5], a[6], a[3], a[4]),
                (cT, cMu, cInv, cV, cI, rV, rI),
            )
            return (cT, cMu, cInv, cV, cI, rV, rI)

        carry = (T_blk, mu_blk, inv_blk, colV, colI, rowsV, rowsI)
        cT, cMu, cInv, cV, cI, rV, rI = jax.lax.fori_loop(
            1, s_final + 1, step, carry
        )
        # Send the traveled column state home (bundle j sits at device
        # j - s_final after the loop) and fold the two sides.
        home = [(i, (i + s_final) % D) for i in range(D)]
        cV, cI = jax.lax.ppermute((cV, cI), "jobs", home)
        better = cV > rV
        return jnp.where(better, cV, rV)[None], jnp.where(better, cI, rI)[None]

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
