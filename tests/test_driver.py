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


def test_profile_phases_recorded():
    from mpx.utils.profile import BenchmarkProfile

    T = random_walk(256, seed=9)
    prof = BenchmarkProfile()
    cfg = MatrixProfileConfig(m=16, dtype="float64", kernel="xla",
                              band=64, chunk=64, tile_rows=8, tile_cols=8)
    compute_matrix_profile(T, config=cfg, profile=prof)
    cats = list(prof.category_totals())
    assert any("Pre-Computation" in c for c in cats)
    assert any("Compute" in c for c in cats)
    assert any("Post-Computation" in c for c in cats)
    assert prof.total() > 0


def test_grouped_dispatch_matches_single():
    """dispatch_group splits the job scan into several device dispatches
    (watchdog resilience); results must match the single-dispatch run and
    the per-entry report must show the groups."""
    from mpx.utils.profile import BenchmarkProfile

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
