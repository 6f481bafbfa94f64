#!/usr/bin/env python3
"""Extended one-off fuzz sweep (not part of CI — run on idle CPU time):
randomized configs across EVERY tier added since round 2 — ring-sharded
(f32+f64), mstamp, topk hybrid, left/right + AB small fused, checkpoint
resume — validated against the golden/brute-force oracles.

Usage: python scripts/fuzz_extended.py [rounds] (default 20)
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from mpx import MatrixProfileConfig, compute_matrix_profile  # noqa: E402
from mpx.reference import compute_matrix_profile_reference  # noqa: E402


def check_profile(T, m, MP, MPI, tol, tag):
    from mpx.ops.precompute import precompute_statistics_numpy

    MP_exp, MPI_exp = compute_matrix_profile_reference(T, m)
    w = T.shape[0] - m + 1
    inv = precompute_statistics_numpy(T, m)["inv"]
    degenerate = ~np.isfinite(inv)
    ok = (np.isfinite(MP_exp) & ~degenerate & (MPI_exp >= 0)
          & ~degenerate[np.clip(MPI_exp, 0, w - 1)])
    got = np.asarray(MP, np.float64)
    err = np.abs(got[ok] - MP_exp[ok]).max() if ok.any() else 0.0
    assert err <= tol, f"{tag}: max err {err} > {tol}"
    return err


def round_ring(rng, seed):
    n = int(rng.integers(256, 1400))
    m = int(rng.integers(8, 48))
    shards = int(rng.choice([1, 2, 4, 8]))
    dtype = str(rng.choice(["float32", "float64"]))
    band = int(rng.choice([32, 64]))
    chunk = int(rng.choice([32, 64, 128]))
    T = np.cumsum(np.random.default_rng(seed).standard_normal(n))
    cfg = MatrixProfileConfig(m=m, dtype=dtype, band=band, chunk=chunk,
                              num_shards=shards, shard_mode="ring",
                              tile_rows=8, tile_cols=16)
    MP, MPI = compute_matrix_profile(T, config=cfg)
    tol = 1e-8 if dtype == "float64" else 2e-3
    err = check_profile(T, m, MP, MPI, tol,
                        f"ring n={n} m={m} d={shards} {dtype}")
    return f"ring n={n} m={m} shards={shards} {dtype}: err={err:.2e}"


def round_mstamp(rng, seed):
    from mpx.mstamp import compute_multidim_profile
    from tests.test_mstamp import assert_multiprofile_close, mstamp_oracle

    d = int(rng.integers(2, 5))
    n = int(rng.integers(120, 300))
    m = int(rng.integers(8, 24))
    dtype = str(rng.choice(["float32", "float64"]))
    shards = int(rng.choice([1, 2, 4]))
    T = np.cumsum(np.random.default_rng(seed).standard_normal((d, n)),
                  axis=1)
    prof = compute_multidim_profile(T, config=MatrixProfileConfig(
        m=m, dtype=dtype, band=32, chunk=64, num_shards=shards))
    P, I = mstamp_oracle(T, m)
    assert_multiprofile_close(prof, P, I,
                              1e-8 if dtype == "float64" else 2e-3)
    return f"mstamp d={d} n={n} m={m} {dtype} shards={shards}: ok"


def round_topk(rng, seed):
    from mpx.topk import compute_topk_profile

    n = int(rng.integers(200, 700))
    m = int(rng.integers(8, 32))
    k = int(rng.integers(2, 6))
    T = np.cumsum(np.random.default_rng(seed).standard_normal(n))
    cfg = MatrixProfileConfig(m=m, dtype="float64", band=32, chunk=64,
                              tile_rows=8, tile_cols=16)
    D, I = compute_topk_profile(T, k=k, config=cfg)
    # oracle: full z-norm distance matrix per row
    from mpx.reference import exclusion_zone

    w = n - m + 1
    excl = exclusion_zone(m)
    wins = np.lib.stride_tricks.sliding_window_view(T, m).astype(np.float64)
    mu = wins.mean(axis=1, keepdims=True)
    c = wins - mu
    nrm = np.sqrt((c * c).sum(axis=1, keepdims=True))
    U = c / nrm
    G = U @ U.T
    dist = np.sqrt(np.maximum(2.0 * m * (1.0 - G), 0.0))
    ii, jj = np.meshgrid(np.arange(w), np.arange(w), indexing="ij")
    dist[np.abs(ii - jj) < excl] = np.inf
    rows = np.random.default_rng(seed + 1).choice(w, size=min(24, w),
                                                  replace=False)
    for r in rows:
        exp = np.sort(dist[r])[:k]
        got = np.asarray(D[r], np.float64)
        fin = np.isfinite(exp)
        assert np.allclose(got[fin], exp[fin], atol=1e-8), (
            f"topk row {r}: {got} vs {exp}")
    return f"topk n={n} m={m} k={k}: ok ({rows.size} rows)"


def round_checkpoint(rng, seed, tmpdir="/tmp/fuzz_ckpt"):
    import os

    from mpx.checkpoint import compute_with_checkpoint

    os.makedirs(tmpdir, exist_ok=True)
    n = int(rng.integers(200, 800))
    m = int(rng.integers(8, 32))
    dtype = str(rng.choice(["float32", "float64", "ap32"]))
    T = np.cumsum(np.random.default_rng(seed).standard_normal(n)) * 0.01
    cfg = MatrixProfileConfig(m=m, dtype=dtype, band=32, chunk=64,
                              tile_rows=8, tile_cols=16)
    path = os.path.join(tmpdir, f"s{seed}.npz")
    MPc, MPIc = compute_with_checkpoint(T, cfg, path, group_jobs=4)
    MPd, MPId = compute_matrix_profile(T, config=cfg)
    assert np.allclose(np.asarray(MPc, np.float64),
                       np.asarray(MPd, np.float64), atol=1e-12), (
        f"checkpoint vs driver diverge: n={n} m={m} {dtype}")
    return f"checkpoint n={n} m={m} {dtype}: ok"


def round_batch(rng, seed):
    from mpx.batch import compute_batch_profiles

    B = int(rng.integers(2, 9))
    n = int(rng.integers(200, 700))
    m = int(rng.integers(8, 40))
    dtype = str(rng.choice(["float32", "float64"]))
    shards = int(rng.choice([1, 2, 4]))
    group = int(rng.integers(1, B + 1))
    batch = np.cumsum(
        np.random.default_rng(seed).standard_normal((B, n)), axis=1)
    cfg = MatrixProfileConfig(m=m, dtype=dtype, band=32, chunk=64,
                              tile_rows=8, tile_cols=16,
                              num_shards=shards)
    MP, MPI = compute_batch_profiles(batch, config=cfg, group=group)
    tol = 1e-8 if dtype == "float64" else 2e-3
    worst = 0.0
    for b in range(B):
        worst = max(worst, check_profile(
            batch[b], m, MP[b], MPI[b], tol,
            f"batch[{b}] n={n} m={m} {dtype}"))
    return (f"batch B={B} n={n} m={m} {dtype} shards={shards} "
            f"group={group}: err={worst:.2e}")


def round_floss(rng, seed):
    from mpx.analysis import one_directional_cac
    from mpx.floss import Floss

    n = int(rng.integers(500, 1200))
    m = int(rng.integers(8, 40))
    window = int(rng.integers(max(300, 5 * m), n))
    step = int(rng.integers(16, 200))
    init = max(4 * m, m + m // 4 + 1)
    T = np.cumsum(np.random.default_rng(seed).standard_normal(n))
    fl = Floss(T[:init], m=m, window=window, dtype="float64")
    for s in range(init, n, step):
        fl.append(T[s : s + step])
    # oracle: batch right profile of the retained window
    mu_w = T[fl.offset:]
    W = np.lib.stride_tricks.sliding_window_view(mu_w, m).astype(np.float64)
    c = W - W.mean(axis=1, keepdims=True)
    nrm = np.sqrt((c * c).sum(axis=1, keepdims=True))
    U = np.divide(c, nrm, out=np.zeros_like(c), where=nrm > 0)
    P = U @ U.T
    wlen = mu_w.shape[0] - m + 1
    i = np.arange(wlen)
    valid = (i[None, :] - i[:, None]) >= m // 4
    D2 = np.where(valid, 2 * m * (1 - np.clip(P, -1, 1)), np.inf)
    has = np.isfinite(D2).any(axis=1)
    MPI_exp = np.where(has, D2.argmin(axis=1), -1).astype(np.int32)
    cac_exp = one_directional_cac(MPI_exp, m)
    err = np.abs(fl.cac() - cac_exp).max()
    assert err < 0.05, f"floss CAC off oracle by {err}"
    return (f"floss n={n} m={m} window={window} step={step} "
            f"offset={fl.offset}: cac err={err:.2e}")


def round_pan_extract(rng, seed):
    from mpx.pan import compute_pan_profile, pan_discords, pan_motifs

    n = int(rng.integers(400, 900))
    ms = sorted(set(int(x) for x in rng.integers(8, 64, size=3)))
    T = np.cumsum(np.random.default_rng(seed).standard_normal(n))
    cfg = MatrixProfileConfig(m=ms[0], dtype="float64", band=32,
                              chunk=64, tile_rows=8, tile_cols=16)
    pan = compute_pan_profile(T, ms, config=cfg)
    mos = pan_motifs(pan, k=3)
    spans = []
    for mo in mos:
        for s in (mo.a, mo.b):
            for lo, hi in spans:
                assert s + mo.m <= lo or s >= hi, "motif overlap"
        spans += [(mo.a, mo.a + mo.m), (mo.b, mo.b + mo.m)]
    dis = pan_discords(pan, k=2)
    for a, b in ((0, 1),):
        if len(dis) == 2:
            assert (dis[b].a + dis[b].m <= dis[a].a
                    or dis[b].a >= dis[a].a + dis[a].m), "discord overlap"
    return f"pan-extract n={n} ms={ms}: {len(mos)} motifs {len(dis)} discords"


def round_missing(rng, seed):
    from mpx.missing import compute_matrix_profile_masked, missing_window_mask

    n = int(rng.integers(300, 900))
    m = int(rng.integers(8, 40))
    dtype = str(rng.choice(["float32", "float64"]))
    T = np.cumsum(np.random.default_rng(seed).standard_normal(n))
    # plant 1-3 gaps of random width
    for _ in range(int(rng.integers(1, 4))):
        g = int(rng.integers(0, n - 5))
        T[g : g + int(rng.integers(1, 12))] = np.nan
    cfg = MatrixProfileConfig(m=m, dtype=dtype, band=32, chunk=64,
                              tile_rows=8, tile_cols=16)
    MP, MPI = compute_matrix_profile_masked(T, config=cfg)
    MP = np.asarray(MP, np.float64)
    MPI = np.asarray(MPI)
    bad = missing_window_mask(T, m)
    assert (MPI[bad] == -1).all(), "gap window joined"
    assert not np.isin(MPI[MPI >= 0], np.nonzero(bad)[0]).any(), (
        "gap window chosen as neighbor")
    # the ONE masked brute-force oracle (shared with the test suite so
    # a semantics change cannot leave the fuzzer validating old rules)
    from tests.test_missing import masked_oracle

    exp, MPI_exp, _ = masked_oracle(T, m)
    has = MPI_exp >= 0
    tol = 1e-8 if dtype == "float64" else 2e-3
    err = np.abs(MP[has] - exp[has]).max() if has.any() else 0.0
    assert err <= tol, f"masked profile off oracle by {err}"
    return (f"missing n={n} m={m} {dtype} gaps={int(bad.sum())}: "
            f"err={err:.2e}")


def round_contrast(rng, seed):
    from mpx.contrast import brute_force_contrast_profile, contrast_profile

    np_rng = np.random.default_rng(seed)
    n_p = int(rng.integers(300, 900))
    n_m = int(rng.integers(300, 900))
    m = int(rng.integers(8, 48))
    dtype = str(rng.choice(["float32", "float64"]))
    Tp = np.cumsum(np_rng.standard_normal(n_p))
    Tm = np.cumsum(np_rng.standard_normal(n_m))
    if rng.integers(2):  # sometimes plant a shared pattern (CP ~ 0 there)
        pat = np.sin(np.linspace(0, 3 * np.pi, m))
        Tp[: m] += pat
        Tm[: m] += pat
    cfg = MatrixProfileConfig(m=m, dtype=dtype, band=32, chunk=64,
                              tile_rows=8, tile_cols=16)
    cp = contrast_profile(Tp, Tm, config=cfg).cp
    exp = brute_force_contrast_profile(Tp, Tm, m)
    tol = 1e-8 if dtype == "float64" else 2e-3
    err = np.abs(cp - exp).max()
    assert err <= tol, f"contrast off oracle by {err}"
    assert cp.min() >= 0.0 and cp.max() <= 1.0
    return f"contrast n+={n_p} n-={n_m} m={m} {dtype}: err={err:.2e}"


def round_chains(rng, seed):
    from mpx.chains import anchored_chain, chain_lengths, chain_links
    from tests.test_left_right import brute_force_left_right

    np_rng = np.random.default_rng(seed)
    n = int(rng.integers(300, 900))
    m = int(rng.integers(8, 48))
    T = np.cumsum(np_rng.standard_normal(n))
    _, il, _, ir = brute_force_left_right(T, m)
    lengths = chain_lengths(il, ir)
    nxt = chain_links(il, ir)
    # DP vs naive follow at random anchors; link structure invariants
    for anchor in np_rng.integers(0, len(il), 16):
        c = anchored_chain(il, ir, int(anchor))
        assert lengths[anchor] == len(c), (anchor, lengths[anchor], len(c))
        assert np.all(np.diff(c) > 0)
        for a, b in zip(c[:-1], c[1:]):
            assert ir[a] == b and il[b] == a
    assert lengths.min() >= 1
    ok = nxt >= 0
    assert np.array_equal(lengths[ok], lengths[nxt[ok]] + 1)
    return f"chains n={n} m={m}: max_len={lengths.max()}"


def round_thresh(rng, seed):
    from mpx.thresh import brute_force_sum_thresh, compute_sum_thresh

    np_rng = np.random.default_rng(seed)
    n = int(rng.integers(300, 900))
    m = int(rng.integers(8, 48))
    thr = float(rng.uniform(-0.5, 0.95))
    dtype = str(rng.choice(["float32", "float64"]))
    T = np.cumsum(np_rng.standard_normal(n))
    cfg = MatrixProfileConfig(m=m, dtype=dtype, band=32, chunk=64,
                              tile_rows=8, tile_cols=16)
    sums, cnts = compute_sum_thresh(T, config=cfg, threshold=thr)
    esums, ecnts = brute_force_sum_thresh(T, m, thr)
    if dtype == "float64":
        assert np.array_equal(cnts, ecnts)
        err = np.abs(sums - esums).max()
        assert err <= 1e-8, f"sum off oracle by {err}"
    else:
        flips = np.abs(cnts.astype(np.int64) - ecnts).max()
        assert flips <= 4, f"count flips {flips}"
        err = np.abs(sums - esums).max()
        # a pair whose f32 correlation lands on the other side of the
        # threshold shifts that row's sum by ~|thr|, exactly once per
        # flip — bound the error by the observed flips, not a constant
        allowed = 2e-2 + flips * (abs(thr) + 1e-3)
        assert err <= allowed, f"sum off oracle by {err} (allow {allowed})"
    return f"thresh n={n} m={m} thr={thr:.2f} {dtype}: err={err:.2e}"


def round_motiflets(rng, seed):
    from mpx.motiflets import k_motiflets, pairwise_extent
    from mpx.reference import exclusion_zone

    np_rng = np.random.default_rng(seed)
    copies = int(rng.integers(3, 7))
    m = int(rng.integers(24, 64))
    n = int(rng.integers(1500, 3000))
    T = np_rng.normal(0, 0.4, n)
    pat = np.sin(np.linspace(0, 3 * np.pi, m))
    gap = n // (copies + 1)
    starts = [gap * (i + 1) for i in range(copies)]
    for s in starts:
        T[s : s + m] += 2.5 * pat + np_rng.normal(0, 0.02, m)
    cfg = MatrixProfileConfig(m=m, dtype="float64", band=64, chunk=128,
                              tile_rows=8, tile_cols=16)
    res = k_motiflets(T, k=copies, config=cfg)
    zone = max(exclusion_zone(m), m // 2)
    assert len(res.indices) == copies
    assert (np.diff(np.sort(res.indices)) >= zone).all()
    assert res.extent == pairwise_extent(
        np.asarray(T, np.float64), m, res.indices)
    # the planted set is reachable from a planted seed, so the greedy
    # result is at least that good
    planted_ext = pairwise_extent(np.asarray(T, np.float64), m, starts)
    assert res.extent <= planted_ext + 1e-9, (res.extent, planted_ext)
    return (f"motiflets n={n} m={m} k={copies}: "
            f"extent={res.extent:.3f} (planted {planted_ext:.3f})")


def round_damp(rng, seed):
    from mpx.damp import OnlineAnomalyDetector, compute_damp
    from tests.test_left_right import brute_force_left_right

    np_rng = np.random.default_rng(seed)
    n = int(rng.integers(500, 1100))
    m = int(rng.integers(8, 48))
    boot = int(rng.integers(m + m // 4 + 8, n // 2))
    step = int(rng.integers(16, 200))
    T = np.cumsum(np_rng.standard_normal(n))
    cfg = MatrixProfileConfig(m=m, dtype="float64", band=64, chunk=128,
                              tile_rows=8, tile_cols=16)
    # online scores == batch left profile == brute-force oracle
    det = OnlineAnomalyDetector(T[:boot], config=cfg)
    for o in range(boot, n, step):
        det.append(T[o : o + step])
    w = n - m + 1
    online = det.scores(det.split, w)
    batch = compute_damp(T, config=cfg)
    bl, _, _, _ = brute_force_left_right(T, m)
    fin = np.isfinite(bl)
    err_b = np.abs(batch.scores[fin] - bl[fin]).max()
    assert err_b <= 1e-8, f"batch off oracle by {err_b}"
    err_o = np.abs(online - batch.scores[det.split :]).max()
    assert err_o <= 1e-8, f"online off batch by {err_o}"
    return f"damp n={n} m={m} boot={boot} step={step}: err={err_o:.2e}"


def round_distmatrix(rng, seed):
    from mpx.distmatrix import brute_force_pooled_matrix, pooled_matrix

    np_rng = np.random.default_rng(seed)
    n = int(rng.integers(200, 900))
    m = int(rng.integers(8, 48))
    mh = int(rng.integers(1, 40))
    mw = int(rng.integers(1, 40))
    pearson = bool(rng.integers(2))
    T = np.cumsum(np_rng.standard_normal(n))
    if rng.integers(2):  # AB mode
        B = np.cumsum(np_rng.standard_normal(int(rng.integers(200, 700))))
        got = pooled_matrix(T, m, mwidth=mw, mheight=mh, B=B,
                            pearson=pearson)
        exp = brute_force_pooled_matrix(T, m, mwidth=mw, mheight=mh, B=B,
                                        pearson=pearson)
        mode = "ab"
    else:
        got = pooled_matrix(T, m, mwidth=mw, mheight=mh, pearson=pearson)
        exp = brute_force_pooled_matrix(T, m, mwidth=mw, mheight=mh,
                                        pearson=pearson)
        mode = "self"
    err = np.abs(got - exp).max()
    assert err <= 2e-3, f"pooled matrix off oracle by {err}"
    return (f"distmatrix {mode} n={n} m={m} {mh}x{mw} "
            f"pearson={pearson}: err={err:.2e}")


def round_merlin(rng, seed):
    from mpx.merlin import (
        brute_force_multi_length_discords,
        multi_length_discords,
    )

    np_rng = np.random.default_rng(seed)
    n = int(rng.integers(300, 900))
    lo = int(rng.integers(4, 16))
    hi = lo + int(rng.integers(2, 12))
    T = np.cumsum(np_rng.standard_normal(n))
    if rng.integers(2):  # plant a glitch
        p = int(rng.integers(0, n - hi))
        T[p : p + hi] += np.linspace(0, 5, hi)
    res = multi_length_discords(T, lo, hi)
    exp = brute_force_multi_length_discords(T, range(lo, hi + 1))
    assert len(res.per_length) == len(exp)
    worst = 0.0
    for got, want in zip(res.per_length, exp):
        assert got.m == want.m
        worst = max(worst, abs(got.distance - want.distance))
    assert worst <= 1e-9, f"merlin discord off oracle by {worst}"
    return f"merlin n={n} m=[{lo},{hi}]: err={worst:.2e}"


def round_compat(rng, seed):
    import mpx.compat.pyscamp as psc
    import mpx.compat.stumpy as st
    from mpx.reference import compute_matrix_profile_reference
    from mpx.thresh import brute_force_sum_thresh_ab

    np_rng = np.random.default_rng(seed)
    n = int(rng.integers(300, 800))
    m = int(rng.integers(8, 48))
    T = np.cumsum(np_rng.standard_normal(n))
    g, _ = compute_matrix_profile_reference(T, m)
    mp_, _ = psc.selfjoin(T, m)
    err_p = np.abs(mp_ - g).max()
    assert err_p <= 2e-3, f"pyscamp selfjoin off golden by {err_p}"
    out = st.stump(T, m)
    err_s = np.abs(out[:, 0].astype(np.float64) - g).max()
    assert err_s <= 2e-3, f"stumpy stump off golden by {err_s}"
    w = out.shape[0]
    i = int(rng.integers(1, w - 1))
    il, ir = int(out[i, 2]), int(out[i, 3])
    assert il < i or il == -1
    assert ir > i or ir == -1
    B = np.cumsum(np_rng.standard_normal(int(rng.integers(200, 600))))
    thr = float(rng.uniform(-0.5, 0.9))
    sab = psc.abjoin_sum(T, B, m, threshold=thr)
    eab, ecnt = brute_force_sum_thresh_ab(T, B, m, threshold=thr)
    from mpx.thresh import compute_sum_thresh_ab

    _, cnt = compute_sum_thresh_ab(T, B, m, threshold=thr)
    flips = np.abs(cnt.astype(np.int64) - ecnt).max()
    assert flips <= 4, f"abjoin_sum count flips {flips}"
    err_t = np.abs(sab - eab).max()
    # threshold-edge pairs flip sides in f32 and move the sum by ~|thr|
    allowed = 1e-2 + flips * (abs(thr) + 1e-3)
    assert err_t <= allowed, (
        f"abjoin_sum off oracle by {err_t} (allow {allowed})")
    return (f"compat n={n} m={m}: pyscamp={err_p:.2e} stump={err_s:.2e} "
            f"absum={err_t:.2e}")


ROUNDS = [round_ring, round_mstamp, round_topk, round_checkpoint,
          round_batch, round_floss, round_pan_extract, round_missing,
          round_contrast, round_chains, round_thresh, round_motiflets,
          round_damp, round_distmatrix, round_merlin, round_compat]


def main() -> int:
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 9000
    failures = 0
    for i in range(total):
        rng = np.random.default_rng(base + i)
        fn = ROUNDS[i % len(ROUNDS)]
        try:
            msg = fn(rng, seed=31 * i + 7 + base)
            print(f"[{i + 1}/{total}] {msg}", flush=True)
        except Exception:
            failures += 1
            print(f"[{i + 1}/{total}] FAIL in {fn.__name__}:", flush=True)
            traceback.print_exc()
    print(f"done: {total - failures}/{total} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
