"""Sparse pass B of the hybrid double tier (mpx/hybrid.py).

Pass A captures each job's per-row/per-column maxima; pass B then
re-examines only the flagged rows/columns (skinny gathered matmuls)
instead of re-sweeping every pair.  These tests pin the sparse path
against the dense sweep and against the golden oracle, including the
flag-budget overflow fallback.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import mpx.hybrid as hybrid
from mpx.config import MatrixProfileConfig, make_job_grid
from mpx.hybrid import (
    compute_ab_join_f64_hybrid,
    compute_left_right_f64_hybrid,
    compute_matrix_profile_f64_hybrid,
    default_margin,
    run_max_jobs,
    run_suspect_jobs,
    run_suspect_jobs_sparse,
)
from mpx.ops.precompute import precompute_statistics
from mpx.reference import compute_matrix_profile_reference

from tests.conftest import random_walk
from tests.helpers import assert_profile_close


@pytest.fixture(autouse=True, params=["plain", "cascade"])
def _cascade_mode(request, monkeypatch):
    """Exercise the sparse machinery with pass A's bf16 cascade both
    off and forced on (opt-in, off by default)."""
    monkeypatch.setenv(
        "MPX_HYBRID_CASCADE", "1" if request.param == "cascade" else "0"
    )
    return request.param


def _suspect_sets(T, m, band, chunk, sparse: bool):
    """Run pass A + pass B on ``T`` and return the combined SuspectWindow."""
    T64 = np.asarray(T, np.float64)
    n = T64.shape[0]
    w = n - m + 1
    stats = precompute_statistics(T64, m, band=band, chunk=chunk,
                                  dtype="float32")
    grid = make_job_grid(w, band, chunk)
    pw = stats.mu.shape[0]
    margin = jnp.float32(default_margin(m))
    kw = dict(S=band, W=chunk, m=m, w=w, tr=8, tc=64)
    if sparse:
        thr, cap = run_max_jobs(
            stats, jnp.asarray(grid.r0), jnp.asarray(grid.k0), margin,
            pw=pw, capture=True, **kw
        )
        return run_suspect_jobs_sparse(stats, thr, cap, **kw)
    thr = run_max_jobs(
        stats, jnp.asarray(grid.r0), jnp.asarray(grid.k0), margin,
        pw=pw, **kw
    )
    return run_suspect_jobs(
        stats, thr, jnp.asarray(grid.r0), jnp.asarray(grid.k0), **kw
    )


@pytest.mark.parametrize("n,m,band,chunk", [(512, 16, 64, 128), (1024, 32, 128, 256)])
def test_sparse_suspects_match_dense(n, m, band, chunk):
    """The sparse pass B captures exactly the dense sweep's suspect sets
    (same counts, same index brackets) on a random walk."""
    T = random_walk(n, seed=5)
    dense = _suspect_sets(T, m, band, chunk, sparse=False)
    sparse = _suspect_sets(T, m, band, chunk, sparse=True)
    for field in ("cnt", "mn", "mx"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sparse, field)),
            np.asarray(getattr(dense, field)),
            err_msg=f"sparse/dense mismatch in {field}",
        )


def test_sparse_budget_overflow_falls_back_dense(monkeypatch):
    """Force a tiny flag budget so every job overflows: the dense
    re-sweep fallback must reproduce the dense suspect sets exactly."""
    monkeypatch.setattr(hybrid, "_sparse_budget", lambda S, W: 2)
    T = random_walk(512, seed=9)
    dense = _suspect_sets(T, 16, 64, 128, sparse=False)
    sparse = _suspect_sets(T, 16, 64, 128, sparse=True)
    for field in ("cnt", "mn", "mx"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sparse, field)),
            np.asarray(getattr(dense, field)),
        )


def test_sparse_job_merge_off_matches_on(monkeypatch):
    """Width-2W merged pass-B jobs (MPX_SPARSE_MERGE=2 — opt-in,
    default off after the measured 2x pass-B regression) capture
    exactly the unmerged suspect sets: merged per-row maxima (max of
    halves) and concatenated column maxima are a sound, exact flag
    oracle."""
    T = random_walk(1024, seed=13)
    monkeypatch.setenv("MPX_SPARSE_MERGE", "2")
    merged = _suspect_sets(T, 32, 128, 128, sparse=True)
    monkeypatch.setenv("MPX_SPARSE_MERGE", "0")
    plain = _suspect_sets(T, 32, 128, 128, sparse=True)
    for field in ("cnt", "mn", "mx"):
        np.testing.assert_array_equal(
            np.asarray(getattr(merged, field)),
            np.asarray(getattr(plain, field)),
            err_msg=f"merge on/off mismatch in {field}",
        )


def test_sparse_job_merge_overflow_expands_both_halves(monkeypatch):
    """A merged job that overflows the flag budget must send BOTH of
    its W-wide halves to the dense re-sweep (a missing half would
    silently drop suspects)."""
    monkeypatch.setenv("MPX_SPARSE_MERGE", "2")
    monkeypatch.setattr(hybrid, "_sparse_budget", lambda S, W: 2)
    T = random_walk(1024, seed=17)
    dense = _suspect_sets(T, 32, 128, 128, sparse=False)
    sparse = _suspect_sets(T, 32, 128, 128, sparse=True)
    for field in ("cnt", "mn", "mx"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sparse, field)),
            np.asarray(getattr(dense, field)),
        )


def test_hybrid_sparse_off_matches_on(monkeypatch):
    """MPX_HYBRID_SPARSE=0 (dense) and the default sparse path produce
    identical exact-f64 profiles."""
    T = random_walk(768, seed=21)
    cfg = MatrixProfileConfig(m=24, dtype="float64", kernel="hybrid",
                              band=64, chunk=128, tile_rows=8, tile_cols=64)
    MP_s, MPI_s = compute_matrix_profile_f64_hybrid(T, cfg)
    monkeypatch.setenv("MPX_HYBRID_SPARSE", "0")
    MP_d, MPI_d = compute_matrix_profile_f64_hybrid(T, cfg)
    np.testing.assert_array_equal(MP_s, MP_d)
    np.testing.assert_array_equal(MPI_s, MPI_d)


def test_hybrid_sparse_plateau_runs():
    """A smooth series produces wide correlation plateaus: >4 suspects
    whose indices bracket a short contiguous run — resolved by the
    interval rescoring, still exact vs the golden."""
    t = np.arange(1024)
    T = np.sin(2 * np.pi * t / 128) + 1e-4 * np.cos(2 * np.pi * t / 997)
    m = 32
    cfg = MatrixProfileConfig(m=m, dtype="float64", kernel="hybrid",
                              band=64, chunk=128, tile_rows=8, tile_cols=64)
    MP, MPI = compute_matrix_profile_f64_hybrid(T, cfg)
    # On this near-periodic series the O(1)-recurrence golden itself
    # drifts ~7e-7, so arbitrate against the independent brute-force
    # oracle instead.  All profile values are ~1e-5 (1 - P ~ 1e-12):
    # sqrt(2m(1-P)) amplifies f64 cancellation, hence the 5e-8 bound
    # (measured hybrid-vs-brute gap: 2.3e-8; recurrence golden: 6.7e-7).
    from mpx.reference import brute_force_matrix_profile

    MP_exp, MPI_exp = brute_force_matrix_profile(T, m)
    np.testing.assert_allclose(MP, MP_exp, atol=5e-8, rtol=0)


def test_hybrid_sparse_left_right_off_matches_on(monkeypatch):
    """Sparse and dense pass B agree exactly on the left/right tier."""
    T = random_walk(640, seed=13)
    m = 20
    cfg = MatrixProfileConfig(m=m, dtype="float64", kernel="hybrid",
                              band=64, chunk=128, tile_rows=8, tile_cols=64)
    s = compute_left_right_f64_hybrid(T, cfg)
    monkeypatch.setenv("MPX_HYBRID_SPARSE", "0")
    d = compute_left_right_f64_hybrid(T, cfg)
    for got, exp in zip(s, d):
        np.testing.assert_array_equal(got, exp)


def test_hybrid_sparse_ab_join_golden():
    from mpx.abjoin import brute_force_ab_join

    A = random_walk(512, seed=2)
    B = random_walk(384, seed=3)
    m = 16
    cfg = MatrixProfileConfig(m=m, dtype="float64", band=64, chunk=128,
                              tile_rows=8, tile_cols=64)
    res = compute_ab_join_f64_hybrid(A, B, cfg)
    mp_a, _, mp_b, _ = brute_force_ab_join(A, B, m)
    np.testing.assert_allclose(res.mp_a, mp_a, atol=1e-8, rtol=0)
    np.testing.assert_allclose(res.mp_b, mp_b, atol=1e-8, rtol=0)


def test_choose_tiers_properties():
    """Adaptive tier selection: always ends at F2, every count fits its
    assigned tier, and the chosen set never does more padded F-work
    than the legacy fixed {64, 256, F2} ladder."""
    from mpx.hybrid import _choose_tiers, _tier_chunks

    S, W, F2 = 4096, 32768, 640
    rng = np.random.default_rng(7)
    counts = np.minimum(rng.gamma(1.2, 55, size=4100).astype(np.int32), 437)

    tiers = _choose_tiers(counts, F2, S, W)
    assert tiers[-1] == F2 and tiers == sorted(tiers) and len(tiers) <= 5

    def padded_work(T):
        srt = np.sort(counts[counts <= F2])
        edges = np.searchsorted(srt, T, side="right")
        pops = np.diff(np.concatenate([[0], edges]))
        total = 0
        for F, p in zip(T, pops):
            if p:
                total += F * sum(
                    (sl.stop - sl.start) + pad
                    for sl, pad in _tier_chunks(int(p), F, S, W)
                )
        return total

    assert max(counts) <= max(tiers)  # every job fits some tier
    assert padded_work(tiers) <= padded_work([64, 256, F2])

    # degenerate inputs
    assert _choose_tiers(np.empty(0, np.int32), F2, S, W) == [F2]
    assert _choose_tiers(np.full(10, F2 + 50), F2, S, W) == [F2]
    t0 = _choose_tiers(np.zeros(100, np.int32), F2, S, W)
    assert t0[-1] == F2 and t0[0] <= 16


def test_hybrid_adaptive_tiers_match_fixed(monkeypatch):
    """The adaptive tier schedule changes only WHICH panel width a job
    runs at, never the suspect set: results are identical to a forced
    single-tier schedule."""
    T = random_walk(1024, seed=21)
    m = 16
    cfg = MatrixProfileConfig(m=m, dtype="float64", kernel="hybrid",
                              band=64, chunk=128, tile_rows=8, tile_cols=64)
    MP_a, MPI_a = compute_matrix_profile_f64_hybrid(T, cfg)
    monkeypatch.setenv("MPX_SPARSE_TIERS", "96")
    MP_f, MPI_f = compute_matrix_profile_f64_hybrid(T, cfg)
    np.testing.assert_array_equal(np.asarray(MP_a), np.asarray(MP_f))
    np.testing.assert_array_equal(np.asarray(MPI_a), np.asarray(MPI_f))
