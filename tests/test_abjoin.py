"""AB-join vs the brute-force oracle."""

import numpy as np
import pytest

from mpx import MatrixProfileConfig
from mpx.abjoin import brute_force_ab_join, compute_ab_join
from tests.conftest import random_walk


@pytest.mark.parametrize("na,nb,m,dtype", [
    (512, 300, 16, "float64"),
    (300, 512, 32, "float64"),
    (1024, 1024, 64, "float32"),
])
def test_ab_join_matches_brute_force(na, nb, m, dtype):
    A = random_walk(na, seed=1)
    B = random_walk(nb, seed=2)
    cfg = MatrixProfileConfig(m=m, dtype=dtype, kernel="mxu",
                              band=128, chunk=128, tile_rows=8, tile_cols=8)
    res = compute_ab_join(A, B, config=cfg)
    mpa, mpia, mpb, mpib = brute_force_ab_join(A, B, m)

    atol = 1e-8 if dtype == "float64" else 2e-3
    np.testing.assert_allclose(np.asarray(res.mp_a), mpa, atol=atol)
    np.testing.assert_allclose(np.asarray(res.mp_b), mpb, atol=atol)
    # indices may differ only at (near-)equidistant ties
    for got_i, exp_i, got_d, exp_d in [
        (np.asarray(res.mpi_a), mpia, np.asarray(res.mp_a), mpa),
        (np.asarray(res.mpi_b), mpib, np.asarray(res.mp_b), mpb),
    ]:
        diff = got_i != exp_i
        assert np.all(np.abs(got_d[diff] - exp_d[diff]) <= max(atol, 1e-6))


def test_ab_join_motif_across_series():
    rng = np.random.default_rng(9)
    A = rng.standard_normal(600) * 0.05
    B = rng.standard_normal(700) * 0.05
    pattern = np.sin(np.linspace(0, 5 * np.pi, 80))
    A[100:180] += pattern
    B[400:480] += pattern
    cfg = MatrixProfileConfig(m=80, dtype="float64", kernel="mxu",
                              band=128, chunk=128)
    res = compute_ab_join(A, B, config=cfg)
    i = int(np.argmin(np.asarray(res.mp_a)))
    assert abs(i - 100) <= 4
    assert abs(int(res.mpi_a[i]) - 400) <= 4


def test_ab_hybrid_fused_matches_staged(monkeypatch):
    """AB fused device chain == staged passes (unequal widths)."""
    import mpx.hybrid as H
    from mpx.abjoin import compute_ab_join

    A = random_walk(900, seed=51)
    B = random_walk(700, seed=52)
    cfg = MatrixProfileConfig(m=16, dtype="float64", band=64, chunk=128,
                              tile_rows=8, tile_cols=64)
    out_f = compute_ab_join(A, B, config=cfg)
    monkeypatch.setattr(H, "HYBRID_SMALL_FUSED_W", 0)
    out_s = compute_ab_join(A, B, config=cfg)
    for fa, fb in zip(out_f, out_s):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))
