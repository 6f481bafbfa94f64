"""End-to-end single-device tests: mpx driver (XLA kernel) vs the golden
reference, over the same config grid the reference's GoogleTest suite uses
(test/TestVanillaKernel.cpp:29-42, test/TestTiledKernel.cpp:29-53 —
n in {128, 1024}, m in {16, 32}, multiple chunk widths)."""

import numpy as np
import pytest

from mpx import MatrixProfileConfig, compute_matrix_profile
from mpx.dtypes import distance_epsilon
from mpx.reference import compute_matrix_profile_reference
from tests.conftest import random_walk
from tests.helpers import assert_profile_close


CONFIGS = [
    # n, m, band, chunk  (band/chunk = the reference's w analog tilings)
    (128, 16, 32, 32),
    (128, 16, 16, 64),
    (1024, 16, 32, 32),
    (1024, 32, 256, 128),
    (1024, 32, 4096, 16384),  # single job (auto-shrunk)
    (300, 8, 64, 32),         # non-power-of-two n, ragged edges
]


@pytest.mark.parametrize("n,m,band,chunk", CONFIGS)
def test_xla_kernel_matches_golden_f64(n, m, band, chunk):
    T = random_walk(n, seed=n * 7 + m)
    cfg = MatrixProfileConfig(
        m=m, dtype="float64", kernel="xla", band=band, chunk=chunk,
        tile_rows=8, tile_cols=8,
    )
    MP, MPI = compute_matrix_profile(T, config=cfg)
    MP_exp, MPI_exp = compute_matrix_profile_reference(T, m)
    assert_profile_close(T, m, MP, MPI, MP_exp, MPI_exp, eps=1e-8)


@pytest.mark.parametrize("n,m", [(1024, 32), (512, 16)])
def test_xla_kernel_f32(n, m):
    T = random_walk(n, seed=n + 1)
    cfg = MatrixProfileConfig(
        m=m, dtype="float32", kernel="xla", band=128, chunk=256,
        tile_rows=8, tile_cols=8,
    )
    MP, MPI = compute_matrix_profile(T, config=cfg)
    MP_exp, MPI_exp = compute_matrix_profile_reference(T, m)
    assert_profile_close(T, m, MP, MPI, MP_exp, MPI_exp,
                         eps=distance_epsilon("float32"))


def test_profile_phases_recorded(monkeypatch):
    from mpx.utils.profile import BenchmarkProfile

    T = random_walk(256, seed=9)
    cfg = MatrixProfileConfig(m=16, dtype="float64", kernel="xla",
                              band=64, chunk=64, tile_rows=8, tile_cols=8)

    # Small problems run as one fused dispatch: one phase entry.
    prof = BenchmarkProfile()
    compute_matrix_profile(T, config=cfg, profile=prof)
    cats = list(prof.category_totals())
    assert any("Fused end-to-end" in c for c in cats)
    assert prof.total() > 0

    # Above the fused width cap the three reference-style phases appear
    # (include/host/BenchmarkProfile.hpp's report shape).
    import mpx.driver as driver

    monkeypatch.setattr(driver, "SMALL_FUSED_MAX_W_F64", 0)
    prof = BenchmarkProfile()
    compute_matrix_profile(T, config=cfg, profile=prof)
    cats = list(prof.category_totals())
    assert any("Pre-Computation" in c for c in cats)
    assert any("Compute" in c for c in cats)
    assert any("Post-Computation" in c for c in cats)
    assert prof.total() > 0


def test_grouped_dispatch_matches_single(monkeypatch):
    """dispatch_group splits the job scan into several device dispatches
    (watchdog resilience); results must match the single-dispatch run and
    the per-entry report must show the groups.  (Fused small-n routing is
    pinned off: this invariant is about grouping, and the fused tier's
    on-device statistics round differently from the host two-pass.)"""
    import mpx.driver as driver
    from mpx.utils.profile import BenchmarkProfile

    monkeypatch.setattr(driver, "SMALL_FUSED_MAX_W_F64", 0)
    T = random_walk(800, seed=21)
    base = dict(m=16, dtype="float64", kernel="mxu", band=64, chunk=64,
                tile_rows=8, tile_cols=8)
    cfg1 = MatrixProfileConfig(**base, dispatch_group=0)
    cfg2 = MatrixProfileConfig(**base, dispatch_group=4)
    MP1, MPI1 = compute_matrix_profile(T, config=cfg1)
    prof = BenchmarkProfile()
    MP2, MPI2 = compute_matrix_profile(T, config=cfg2, profile=prof)
    np.testing.assert_array_equal(np.asarray(MP1), np.asarray(MP2))
    np.testing.assert_array_equal(np.asarray(MPI1), np.asarray(MPI2))
    report = prof.report()
    assert "group_0" in report and "group_1" in report


def test_constant_window_skipped():
    # Zero-variance subsequences must never be anyone's neighbor, and get
    # the untouched sentinel themselves only if nothing matches them.
    T = random_walk(256, seed=4)
    T[100:140] = 1.0
    m = 16
    cfg = MatrixProfileConfig(m=m, dtype="float64", kernel="xla",
                              band=64, chunk=64, tile_rows=8, tile_cols=8)
    MP, MPI = compute_matrix_profile(T, config=cfg)
    MPI = np.asarray(MPI)
    w = 256 - m + 1
    from mpx.ops.precompute import precompute_statistics_numpy
    inv = precompute_statistics_numpy(T, m)["inv"]
    degenerate = ~np.isfinite(inv)
    assert degenerate.any()
    matched = MPI[MPI >= 0]
    assert not np.isin(matched, np.nonzero(degenerate)[0]).any()
    assert np.isfinite(np.asarray(MP)[~degenerate]).all()


def test_fused_small_path_matches_classic(monkeypatch):
    """The one-dispatch fused tier must agree with the staged path
    (within precompute-estimator rounding) and with the golden, for both
    dtypes and for left/right profiles."""
    import mpx.driver as driver
    from tests.helpers import assert_profile_close

    T = random_walk(3000, seed=11)
    for dtype in ("float32", "float64"):
        cfg = MatrixProfileConfig(m=32, dtype=dtype, kernel="mxu",
                                  band=256, chunk=512)
        MPf, MPIf = compute_matrix_profile(T, config=cfg)  # fused (small w)
        monkeypatch.setattr(driver, "SMALL_FUSED_MAX_W", 0)
        monkeypatch.setattr(driver, "SMALL_FUSED_MAX_W_F64", 0)
        MPc, MPIc = compute_matrix_profile(T, config=cfg)  # classic
        monkeypatch.undo()
        tol = 1e-8 if dtype == "float64" else 2e-3
        assert_profile_close(T, 32, np.asarray(MPf, np.float64),
                             np.asarray(MPIf), np.asarray(MPc, np.float64),
                             np.asarray(MPIc), eps=tol)

    cfg = MatrixProfileConfig(m=32, dtype="float64", kernel="mxu",
                              band=256, chunk=512)
    out_f = compute_matrix_profile(T, config=cfg, left_right=True)
    monkeypatch.setattr(driver, "SMALL_FUSED_MAX_W_F64", 0)
    out_c = compute_matrix_profile(T, config=cfg, left_right=True)
    for a, b in zip(out_f, out_c):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, atol=1e-8)
        else:
            # index ties across estimators: values must still agree
            assert (a == b).mean() > 0.99
