"""k-NN matrix profile vs a brute-force top-k oracle."""

import numpy as np
import pytest

from mpx import MatrixProfileConfig
from mpx.reference import exclusion_zone, znormalized_distance_matrix
from mpx.topk import compute_topk_profile
from tests.conftest import random_walk


def brute_force_topk(T, m, k):
    D = znormalized_distance_matrix(T, m)
    w = D.shape[0]
    excl = exclusion_zone(m)
    i, j = np.meshgrid(np.arange(w), np.arange(w), indexing="ij")
    D = np.where(np.abs(i - j) < excl, np.inf, D)
    D = np.where(np.isnan(D), np.inf, D)
    idx = np.argsort(D, axis=1, kind="stable")[:, :k]
    dist = np.take_along_axis(D, idx, axis=1)
    idx = np.where(np.isfinite(dist), idx, -1)
    return dist, idx


@pytest.mark.parametrize("n,m,k", [(300, 16, 4), (512, 32, 8), (256, 8, 1)])
def test_topk_matches_brute_force(n, m, k):
    T = random_walk(n, seed=n + k)
    cfg = MatrixProfileConfig(m=m, dtype="float64", kernel="mxu",
                              band=64, chunk=128, tile_rows=8, tile_cols=8)
    D, I = compute_topk_profile(T, k=k, config=cfg)
    D = np.asarray(D, np.float64)
    I = np.asarray(I)
    De, Ie = brute_force_topk(T, m, k)

    fin = np.isfinite(De)
    np.testing.assert_allclose(D[fin], De[fin], atol=1e-8)
    assert np.all(np.isinf(D[~fin]))
    # indices may differ only where distances tie
    diff = (I != Ie) & fin
    assert np.all(np.abs(D[diff] - De[diff]) <= 1e-8)
    # sorted ascending
    assert np.all(np.diff(D, axis=1) >= -1e-12)


def test_topk_k1_matches_profile():
    from mpx import compute_matrix_profile

    T = random_walk(400, seed=9)
    cfg = MatrixProfileConfig(m=16, dtype="float64", kernel="mxu",
                              band=64, chunk=64)
    D, I = compute_topk_profile(T, k=1, config=cfg)
    MP, MPI = compute_matrix_profile(T, config=cfg)
    np.testing.assert_allclose(
        np.asarray(D)[:, 0], np.asarray(MP), atol=1e-10
    )


@pytest.mark.parametrize("n,m,k", [(300, 16, 4), (512, 32, 8), (256, 8, 1)])
def test_topk_hybrid_matches_brute_force(n, m, k):
    """dtype=float64 + kernel=auto routes top-k through the hybrid tier
    (exact f64 with threshold descent); must match the brute oracle."""
    T = random_walk(n, seed=n + k)
    cfg = MatrixProfileConfig(m=m, dtype="float64",
                              band=64, chunk=128, tile_rows=8, tile_cols=8)
    D, I = compute_topk_profile(T, k=k, config=cfg)
    D = np.asarray(D, np.float64)
    I = np.asarray(I)
    assert isinstance(D, np.ndarray)
    De, Ie = brute_force_topk(T, m, k)

    fin = np.isfinite(De)
    np.testing.assert_allclose(D[fin], De[fin], atol=1e-8)
    assert np.all(np.isinf(D[~fin]))
    diff = (I != Ie) & fin
    assert np.all(np.abs(D[diff] - De[diff]) <= 1e-8)
    assert np.all(np.diff(D, axis=1) >= -1e-12)


def test_topk_hybrid_tie_heavy_escalation():
    """Repeated motifs force capture overflow and the pass-C /
    threshold-descent paths; results stay exact."""
    rng = np.random.default_rng(17)
    motif = np.sin(np.linspace(0, 2 * np.pi, 24))
    T = rng.standard_normal(24 * 40) * 1e-3
    for r in range(40):
        T[r * 24 : r * 24 + 24] += motif
    m, k = 16, 4
    cfg = MatrixProfileConfig(m=m, dtype="float64",
                              band=64, chunk=128, tile_rows=8, tile_cols=8)
    D, I = compute_topk_profile(T, k=k, config=cfg)
    De, Ie = brute_force_topk(T, m, k)
    fin = np.isfinite(De)
    np.testing.assert_allclose(np.asarray(D)[fin], De[fin], atol=1e-8)


@pytest.mark.parametrize(
    "k1,k2",
    [
        (8, 64),   # wide-K2 device pass certifies the plateau rows
        (8, 16),   # plateau > K2: batched host GEMM remainder runs too
        (8, 0),    # K2 disabled: direct host-scan fallback
    ],
)
def test_topk_hybrid_wide_k_escalation(monkeypatch, k1, k2):
    """Force the pass-C escalation ladder at toy sizes via the
    MPX_TOPK_K1/K2 knobs: tiny K1 overflows the tie plateau of a
    40x-repeated motif, so rows climb K1 -> wide-K2 device rescan ->
    (plateau > K2) batched host GEMM scan.  Every stage must stay
    exact vs the brute oracle."""
    monkeypatch.setenv("MPX_TOPK_K1", str(k1))
    monkeypatch.setenv("MPX_TOPK_K2", str(k2))
    rng = np.random.default_rng(29)
    motif = np.sin(np.linspace(0, 2 * np.pi, 24))
    T = rng.standard_normal(24 * 40) * 1e-3
    for r in range(40):
        T[r * 24 : r * 24 + 24] += motif
    m, k = 16, 4
    cfg = MatrixProfileConfig(m=m, dtype="float64",
                              band=64, chunk=128, tile_rows=8, tile_cols=8)
    D, I = compute_topk_profile(T, k=k, config=cfg)
    De, Ie = brute_force_topk(T, m, k)
    fin = np.isfinite(De)
    np.testing.assert_allclose(np.asarray(D)[fin], De[fin], atol=1e-8)
    assert np.all(np.diff(np.asarray(D), axis=1) >= -1e-12)


def test_topk_hybrid_spread_neighbors():
    """Rows whose k-th neighbor sits far below the best exercise the
    threshold-descent rounds (first band holds < k suspects)."""
    rng = np.random.default_rng(23)
    T = np.cumsum(rng.standard_normal(700))
    m, k = 24, 6
    cfg = MatrixProfileConfig(m=m, dtype="float64",
                              band=64, chunk=128, tile_rows=8, tile_cols=8)
    D, I = compute_topk_profile(T, k=k, config=cfg)
    De, Ie = brute_force_topk(T, m, k)
    fin = np.isfinite(De)
    np.testing.assert_allclose(np.asarray(D)[fin], De[fin], atol=1e-8)


def test_topk_hybrid_rejects_large_k_to_strict():
    """k > 8 in double stays on the strict device path (still correct)."""
    T = random_walk(256, seed=3)
    cfg = MatrixProfileConfig(m=16, dtype="float64",
                              band=64, chunk=64, tile_rows=8, tile_cols=8)
    D, I = compute_topk_profile(T, k=12, config=cfg)
    De, Ie = brute_force_topk(T, 16, 12)
    fin = np.isfinite(De)
    np.testing.assert_allclose(np.asarray(D, np.float64)[fin], De[fin],
                               atol=1e-8)


@pytest.mark.parametrize(
    "runcap,cap_delta",
    [
        (8, "8e-3"),    # tiny bracket: plateau rows spill into pass C
        (512, "1e-4"),  # tight seed clamp: extra descent rounds
        (512, "1e9"),   # clamp off: the raw k-th-job-max seeding path
    ],
)
def test_topk_hybrid_runcap_and_seed_clamp(monkeypatch, runcap, cap_delta):
    """The plateau-bracket width (MPX_TOPK_RUNCAP) and the seeding
    clamp (MPX_TOPK_CAP) only move rows between resolution paths —
    bracket rescore vs pass C vs descent rounds — never the result.
    A repeated motif makes wide tie plateaus; every configuration must
    match the brute oracle exactly."""
    monkeypatch.setenv("MPX_TOPK_RUNCAP", str(runcap))
    monkeypatch.setenv("MPX_TOPK_CAP", cap_delta)
    rng = np.random.default_rng(31)
    motif = np.sin(np.linspace(0, 2 * np.pi, 24))
    T = rng.standard_normal(24 * 30) * 1e-3
    for r in range(30):
        T[r * 24 : r * 24 + 24] += motif
    m, k = 16, 4
    cfg = MatrixProfileConfig(m=m, dtype="float64",
                              band=64, chunk=128, tile_rows=8, tile_cols=8)
    D, I = compute_topk_profile(T, k=k, config=cfg)
    De, Ie = brute_force_topk(T, m, k)
    fin = np.isfinite(De)
    np.testing.assert_allclose(np.asarray(D)[fin], De[fin], atol=1e-8)
    assert np.all(np.diff(np.asarray(D), axis=1) >= -1e-12)
