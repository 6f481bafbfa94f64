"""Probe pass B tier populations and per-tier wall time at the
showcase geometry (n=2^20, m=256, band=4096, chunk=16384)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpx.config import MatrixProfileConfig, make_job_grid
from mpx.hybrid import (
    _flag_counts, _init_suspects, _sparse_budget, _sparse_suspect_group,
    _sparse_tiers, _tier_chunks, default_margin, run_max_jobs,
    HYBRID_PRECISION,
)
from mpx.dtypes import AGGREGATE_INIT
from mpx.ops.precompute import precompute_statistics
from mpx.runtime import enable_compilation_cache

enable_compilation_cache()

n, m = 1 << 20, 256
S, W = 4096, 16384
rng = np.random.default_rng(0)
T = np.cumsum(rng.standard_normal(n))
w = n - m + 1

stats = precompute_statistics(T, m, band=S, chunk=W, dtype="float32")
jax.block_until_ready(stats.mu)
pw = stats.mu.shape[0]
grid = make_job_grid(w, S, W)
margin = default_margin(m)

t0 = time.perf_counter()
thr, cap = run_max_jobs(
    stats, jnp.asarray(grid.r0), jnp.asarray(grid.k0), jnp.float32(margin),
    S=S, W=W, m=m, w=w, tr=64, tc=64, pw=pw, capture=True,
)
np.asarray(thr)
print(f"pass A: {time.perf_counter() - t0:.2f}s, groups={len(cap)}")

counts = np.concatenate([
    np.asarray(_flag_counts(thr, thr, gr, gk, jrow, jcol, S=S, W=W))
    for gr, gk, jrow, jcol in cap
])
print(f"jobs={counts.size} flags/job: mean={counts.mean():.0f} "
      f"p50={np.percentile(counts, 50):.0f} p90={np.percentile(counts, 90):.0f} "
      f"p99={np.percentile(counts, 99):.0f} max={counts.max()}")

F2 = _sparse_budget(S, W)
tiers = _sparse_tiers(F2)
print(f"tiers={tiers} populations:",
      {F: int(((counts <= F) & (counts > ([0] + tiers)[tiers.index(F)])).sum())
       for F in tiers})

# Time one tier sweep at each F over its own population (warm, 2nd call).
gr_all = np.asarray(cap[0][0]) if len(cap) == 1 else np.concatenate([np.asarray(g[0]) for g in cap])
prev = 0
for F in tiers:
    sel_all = (counts > prev) & (counts <= F)
    prev = F
    njobs = int(sel_all.sum())
    if njobs == 0:
        print(f"F={F}: 0 jobs")
        continue
    # build this tier's arrays (single cap group at this geometry)
    gr, gk, jrow, jcol = cap[0]
    idx = jnp.asarray(np.nonzero(sel_all)[0].astype(np.int32))
    args0 = (jnp.take(gr, idx), jnp.take(gk, idx),
             jnp.take(jrow, idx, axis=0), jnp.take(jcol, idx, axis=0))
    for rep in range(2):
        rows_g, cols_g = _init_suspects(w + S), _init_suspects(w + W)
        t0 = time.perf_counter()
        for sl, pad in _tier_chunks(njobs, F, S, W):
            a = tuple(x[sl] for x in args0)
            if pad:
                a = (jnp.concatenate([a[0], jnp.full((pad,), w, jnp.int32)]),
                     jnp.concatenate([a[1], jnp.zeros((pad,), jnp.int32)]),
                     jnp.concatenate([a[2], jnp.full((pad, S), AGGREGATE_INIT, jnp.float32)]),
                     jnp.concatenate([a[3], jnp.full((pad, W), AGGREGATE_INIT, jnp.float32)]))
            rows_g, cols_g, _ = _sparse_suspect_group(
                stats, thr, *a, rows_g, cols_g,
                S=S, W=W, m=m, w=w, tr=64, tc=64, F=F,
                prec=HYBRID_PRECISION,
            )
        jax.block_until_ready(rows_g.cnt)
        dt = time.perf_counter() - t0
    print(f"F={F}: {njobs} jobs, {dt:.2f}s warm ({dt / njobs * 1e3:.2f} ms/job)")


# --- ablation: same kernel, carry merges replaced by a scalar fold ---
from functools import partial as _partial
from mpx.kernels import band_geometry
from mpx.kernels.mxu import sweep_band_suspects_sparse
from mpx.hybrid import _prec


@_partial(jax.jit, static_argnames=("S", "W", "m", "w", "F", "prec"))
def _nomerge_group(stats, thr, r0s, k0s, jrow_g, jcol_g, *, S, W, m, w, F,
                   prec=None):
    geom = band_geometry(S, W, m, w, 64, 64)

    def body(acc, job):
        r0, k0, jrow, jcol = job
        win_r, win_c, over = sweep_band_suspects_sparse(
            stats, r0, k0, jrow, jcol, geom, thr, F,
            precision=_prec(prec),
        )
        acc = acc + jnp.sum(win_r.cnt) + jnp.sum(win_c.cnt) \
            + jnp.sum(win_r.mn) + jnp.sum(win_c.mx)
        return acc, None

    return jax.lax.scan(body, jnp.int32(0), (r0s, k0s, jrow_g, jcol_g))[0]


for F in (64, 256):
    sel_all = counts <= F if F == 64 else (counts > 64) & (counts <= 256)
    njobs = int(sel_all.sum())
    gr, gk, jrow, jcol = cap[0]
    idx = jnp.asarray(np.nonzero(sel_all)[0].astype(np.int32))
    a4 = (jnp.take(gr, idx), jnp.take(gk, idx),
          jnp.take(jrow, idx, axis=0), jnp.take(jcol, idx, axis=0))
    for rep in range(2):
        t0 = time.perf_counter()
        acc = _nomerge_group(stats, thr, *a4, S=S, W=W, m=m, w=w, F=F,
                             prec=HYBRID_PRECISION)
        np.asarray(acc)
        dt = time.perf_counter() - t0
    print(f"NOMERGE F={F}: {njobs} jobs, {dt:.2f}s warm ({dt / njobs * 1e3:.2f} ms/job)")
