"""Ablate sweep_band_suspects_sparse stage by stage at F=64 on the
showcase geometry to find the per-job F-independent cost."""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mpx.config import make_job_grid
from mpx.dtypes import AGGREGATE_INIT
from mpx.hybrid import (
    HYBRID_PRECISION, _flag_counts, _prec, default_margin, run_max_jobs,
)
from mpx.kernels import band_geometry
from mpx.kernels.mxu import (
    SUSPECT_MAX_INIT, SUSPECT_MIN_INIT, _dense_merge_cols, _flagged_indices,
    _panel, _suspect_reduce,
)
from mpx.ops.precompute import precompute_statistics
from mpx.runtime import enable_compilation_cache

enable_compilation_cache()

n, m = 1 << 20, 256
S, W = 4096, 16384
F = 64
rng = np.random.default_rng(0)
T = np.cumsum(rng.standard_normal(n))
w = n - m + 1

stats = precompute_statistics(T, m, band=S, chunk=W, dtype="float32")
jax.block_until_ready(stats.mu)
pw = stats.mu.shape[0]
grid = make_job_grid(w, S, W)
margin = default_margin(m)
thr, cap = run_max_jobs(
    stats, jnp.asarray(grid.r0), jnp.asarray(grid.k0), jnp.float32(margin),
    S=S, W=W, m=m, w=w, tr=64, tc=64, pw=pw, capture=True,
)
np.asarray(thr)
counts = np.concatenate([
    np.asarray(_flag_counts(thr, thr, gr, gk, jrow, jcol, S=S, W=W))
    for gr, gk, jrow, jcol in cap
])
sel = counts <= F
njobs = int(sel.sum())
gr, gk, jrow, jcol = cap[0]
idx = jnp.asarray(np.nonzero(sel)[0].astype(np.int32))
A4 = (jnp.take(gr, idx), jnp.take(gk, idx),
      jnp.take(jrow, idx, axis=0), jnp.take(jcol, idx, axis=0))
prec = _prec(HYBRID_PRECISION)
geom = band_geometry(S, W, m, w, 64, 64)


def kernel_stage(stage, r0, k0, jrowv, jcolv):
    """Re-implementation of sweep_band_suspects_sparse, truncatable."""
    dt = jnp.float32
    excl, wc = geom.excl, geom.wc
    c0 = r0 + k0
    thr_r = jax.lax.dynamic_slice(thr, (r0,), (S,))
    thr_cw = jax.lax.dynamic_slice(thr, (c0,), (W,))
    dec = lambda q: q.astype(jnp.float32) * jnp.float32(2.0 / 65535.0) - 1.0
    flags_r = dec(jrowv) >= thr_r
    flags_c = dec(jcolv) >= thr_cw
    if stage == "flags":
        return jnp.sum(flags_r) + jnp.sum(flags_c)
    idx_r = _flagged_indices(flags_r, F, S)
    idx_c = _flagged_indices(flags_c, F, W)
    if stage == "nonzero":
        return jnp.sum(idx_r) + jnp.sum(idx_c)
    pad_r = idx_r < S
    pad_c = idx_c < W
    rows_f = r0 + jnp.where(pad_r, idx_r, 0)
    cols_f = c0 + jnp.where(pad_c, idx_c, 0)
    gather = lambda st, ix: jnp.take(st.windows, jnp.minimum(ix, pw - 1), axis=0)
    Uf_r = gather(stats, rows_f)
    Uf_c = gather(stats, cols_f)
    if stage == "gather":
        return jnp.sum(Uf_r) + jnp.sum(Uf_c)
    fin_fr = jnp.isfinite(stats.inv[jnp.minimum(rows_f, pw - 1)]) & pad_r
    fin_fc = jnp.isfinite(stats.inv[jnp.minimum(cols_f, pw - 1)]) & pad_c
    thr_fr = jnp.where(pad_r, thr_r[jnp.minimum(idx_r, S - 1)], jnp.inf)
    thr_fc = jnp.where(pad_c, thr_cw[jnp.minimum(idx_c, W - 1)], jnp.inf)
    Uc, fin_c = _panel(stats, c0, W, m)
    Ur, fin_r = _panel(stats, r0, S, m)
    dot = lambda A, B: jax.lax.dot_general(
        A, B, (((1,), (1,)), ((), ())), preferred_element_type=dt,
        precision=prec)
    P_r = dot(Uf_r, Uc)
    P_c = dot(Uf_c, Ur)
    if stage == "matmul":
        return jnp.sum(P_r) + jnp.sum(P_c)
    cols_w = c0 + jnp.arange(W, dtype=jnp.int32)[None, :]
    delta_r = cols_w - rows_f[:, None]
    valid_r = ((delta_r >= excl) & (rows_f[:, None] <= w - 1)
               & (cols_w <= wc - 1) & fin_fr[:, None] & fin_c[None, :])
    hit_r = valid_r & (P_r >= thr_fr[:, None])
    rows_w = r0 + jnp.arange(S, dtype=jnp.int32)[None, :]
    delta_c = cols_f[:, None] - rows_w
    valid_c = ((delta_c >= excl) & (rows_w <= w - 1)
               & (cols_f[:, None] <= wc - 1) & fin_fc[:, None] & fin_r[None, :])
    hit_c = valid_c & (P_c >= thr_fc[:, None])
    if stage == "mask":
        return jnp.sum(hit_r) + jnp.sum(hit_c)
    win_r = _suspect_reduce(hit_r, jnp.broadcast_to(cols_w, (F, W)), axis=1)
    win_c = _suspect_reduce(hit_c, jnp.broadcast_to(rows_w, (F, S)), axis=1)
    if stage == "reduce":
        return (jnp.sum(win_r.cnt) + jnp.sum(win_c.cnt)
                + jnp.sum(win_r.mn) + jnp.sum(win_c.mx))
    dm_r = _dense_merge_cols(idx_r, win_r, F, S)
    dm_c = _dense_merge_cols(idx_c, win_c, F, W)
    return (jnp.sum(dm_r.cnt) + jnp.sum(dm_c.cnt)
            + jnp.sum(dm_r.mn) + jnp.sum(dm_c.mx))


@partial(jax.jit, static_argnames=("stage",))
def run_stage32(a4, *, stage):
    def body(acc, job):
        return acc + kernel_stage(stage, *job).astype(jnp.float32), None
    return jax.lax.scan(body, jnp.float32(0.0), (a4[0], a4[1], a4[2], a4[3]))[0]


for stage in ("nonzero", "gather", "matmul", "reduce", "full"):
    for _ in range(2):
        t0 = time.perf_counter()
        acc = run_stage32(A4, stage=stage)
        np.asarray(acc)
        dt = time.perf_counter() - t0
    print(f"{stage:8s}: {dt:.2f}s ({dt / njobs * 1e3:.3f} ms/job, {njobs} jobs)")
