#!/usr/bin/env python3
"""AOT-lower each jitted component of the hybrid top-k tier at the 1M
benchmark geometry (n=2^20, m=256, band=4096, chunk=16384, k=4) on the
CPU backend, timing trace/lower and compile separately.

Purpose (round-4 review item 3): the topk-f64-1048576-k4 suite row's
first dispatch/compile never completed within 600s on the TPU relay.
A pathological HLO (unrolled loop, constant-folding blowup) reproduces
on any backend; this isolates WHICH component carries it without
touching the relay.

Each component runs in-process but is timed separately; run under
`timeout` if a component is suspected of hanging:

    timeout 900 python scripts/probe_topk_compile.py [--component NAME]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")

import jax  # noqa: E402

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N, M, K = 1 << 20, 256, 4
S, W = 4096, 16384
TR, TC = 64, 128


def timed_lower_compile(name, fn, *args, **kwargs):
    t0 = time.time()
    lowered = jax.jit(
        fn,
        static_argnames=kwargs.pop("static_argnames", ()),
    ).lower(*args, **kwargs)
    t_lower = time.time() - t0
    hlo_len = len(lowered.as_text())
    t0 = time.time()
    lowered.compile()
    t_compile = time.time() - t0
    print(
        f"{name:42s} lower {t_lower:7.1f}s  compile {t_compile:7.1f}s  "
        f"hlo {hlo_len/1e6:6.2f} MB",
        flush=True,
    )


def main():
    global W
    ap = argparse.ArgumentParser()
    ap.add_argument("--component", default=None)
    ap.add_argument("--n", type=int, default=N)
    ap.add_argument("--chunk", type=int, default=W)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real backend: compiles prime the "
                         "persistent cache so the suite row dispatches "
                         "warm instead of one monolithic relay compile")
    args = ap.parse_args()
    n = args.n
    W = args.chunk

    from mpx.config import MatrixProfileConfig, make_job_grid
    from mpx.ops.precompute import precompute_statistics
    import mpx.hybrid as H

    w = n - M + 1
    cfg = MatrixProfileConfig(m=M, dtype="float64", band=S, chunk=W)
    T = np.cumsum(np.random.default_rng(0).standard_normal(n))

    t0 = time.time()
    stats = precompute_statistics(T, M, band=S, chunk=W, dtype="float32",
                                  matmul_only=True)
    jax.block_until_ready(stats.mu)
    print(f"{'precompute (incl windows)':42s} total {time.time()-t0:7.1f}s",
          flush=True)

    grid = make_job_grid(w, S, W)
    pw = stats.mu.shape[0]
    groups = H._job_groups(np.asarray(grid.r0, np.int32),
                           np.asarray(grid.k0, np.int32), S, W, w)
    print(f"# jobs={grid.r0.shape[0]} groups={len(groups)} "
          f"group_size={groups[0][0].shape[0]} pw={pw}", flush=True)

    gr, gk = groups[0]
    gr_d, gk_d = jnp.asarray(gr), jnp.asarray(gk)
    Lr, Lc = w + S, w + W
    rmax = jnp.full((Lr,), jnp.float32(-1e12))
    cmax = jnp.full((Lc,), jnp.float32(-1e12))

    want = lambda c: args.component in (None, c)

    if want("pass_a"):
        timed_lower_compile(
            "pass A _max_jobs_group (capture)",
            lambda st, r, k, rm, cm: H._max_jobs_group(
                st, r, k, rm, cm, S=S, W=W, m=M, w=w, tr=TR, tc=TC,
                capture=True, prec="HIGH"),
            stats, gr_d, gk_d, rmax, cmax,
        )

    G = gr.shape[0]
    jrow = jnp.zeros((G, S), jnp.uint16)
    jcol = jnp.zeros((G, W), jnp.uint16)
    thr = jnp.full((Lr + W,), jnp.float32(0.5))

    if want("kth_max"):
        Lg = w + S + W
        gv = jnp.full((Lg, K), jnp.float32(-1e12))
        timed_lower_compile(
            "topk thr estimate _job_kth_max_group",
            lambda r, k, a, b, g: H._job_kth_max_group(
                r, k, a, b, g, S=S, W=W, k=K),
            gr_d, gk_d, jrow, jcol, gv,
        )

    if want("flag_counts"):
        timed_lower_compile(
            "_flag_counts",
            lambda t, tc_, r, k, a, b: H._flag_counts(
                t, tc_, r, k, a, b, S=S, W=W),
            thr, thr, gr_d, gk_d, jrow, jcol,
        )

    F2 = H._sparse_budget(S, W)
    tiers = H._sparse_tiers(F2)
    if tiers is None:  # adaptive default: prime the whole rung ladder
        tiers = sorted({f for f in H._TIER_LADDER if f < F2} | {F2})
    for F in tiers:
        if not want(f"sparse_F{F}"):
            continue
        # one representative power-of-two batch per tier
        B = 256
        rows_g = H._init_suspects(Lr)
        cols_g = H._init_suspects(Lc)
        timed_lower_compile(
            f"pass B _sparse_suspect_group F={F} B={B}",
            lambda st, t, r, k, a, b, rg, cg, F=F: H._sparse_suspect_group(
                st, t, r, k, a, b, rg, cg,
                S=S, W=W, m=M, w=w, tr=TR, tc=TC, F=F, prec="HIGH"),
            stats, thr, gr_d[:B], gk_d[:B], jrow[:B], jcol[:B],
            rows_g, cols_g,
        )

    if want("pass_c"):
        CW = 16384
        CW_ = CW
        while pw % CW_:
            CW_ //= 2
        fidx = jnp.zeros((256,), jnp.int32)
        timed_lower_compile(
            f"pass C scan_flagged_rows K=64 CW={CW_}",
            lambda st, t, f: H.scan_flagged_rows(
                st, t, f, m=M, w=w, excl=M // 4, K=64, CW=CW_),
            stats, thr, fidx,
        )

    if want("dense_b"):
        rows_g = H._init_suspects(Lr)
        cols_g = H._init_suspects(Lc)
        timed_lower_compile(
            "dense pass B _suspect_jobs_group",
            lambda st, t, r, k, rg, cg: H._suspect_jobs_group(
                st, t, r, k, rg, cg, S=S, W=W, m=M, w=w, tr=TR, tc=TC,
                prec="HIGH"),
            stats, thr, gr_d, gk_d, rows_g, cols_g,
        )

    print("done", flush=True)


if __name__ == "__main__":
    main()
