"""Dataset parity tests mirroring the reference's GoogleTest grid
(test/TestVanillaKernel.cpp:29-42, test/TestTiledKernel.cpp:29-53):
the same vendored datasets, the same (n, m, w, t) configurations, the
same tolerance and equidistant-tie rules."""

import numpy as np
import pytest

from mpx import MatrixProfileConfig, compute_matrix_profile
from mpx.io.datasets import load_dataset
from mpx.reference import compute_matrix_profile_reference
from tests.helpers import assert_profile_close


def _golden(T, m):
    from mpx import native

    if native.is_available():
        return native.golden_scamp(T, m)
    return compute_matrix_profile_reference(T, m)


# Reference configs: (dataset, n, m, band/chunk analogs of w, t)
GRID = [
    ("small128_syn.txt", 128, 16, 32, 16),
    ("1024.txt", 1024, 16, 32, 16),
    ("1024.txt", 1024, 16, 256, 128),
    ("1024.txt", 1024, 16, 512, 128),
]


@pytest.mark.parametrize("name,n,m,chunk,band", GRID)
def test_dataset_config_grid_hybrid(name, n, m, chunk, band):
    """The reference grid on the DEFAULT double path (the hybrid tier) —
    same ε=1e-8 and equidistant-tie contract."""
    T = load_dataset(name)[:n]
    cfg = MatrixProfileConfig(
        m=m, dtype="float64", kernel="hybrid", band=band, chunk=chunk,
        tile_rows=8, tile_cols=8,
    )
    MP, MPI = compute_matrix_profile(T, config=cfg)
    MP_exp, MPI_exp = _golden(T, m)
    assert_profile_close(T, m, MP, MPI, MP_exp, MPI_exp, eps=1e-8)


@pytest.mark.parametrize("name,n,m,chunk,band", GRID)
def test_dataset_config_grid(name, n, m, chunk, band):
    T = load_dataset(name)[:n]
    assert T.shape[0] == n
    cfg = MatrixProfileConfig(
        m=m, dtype="float64", kernel="xla", band=band, chunk=chunk,
        tile_rows=8, tile_cols=8,
    )
    MP, MPI = compute_matrix_profile(T, config=cfg)
    MP_exp, MPI_exp = _golden(T, m)
    assert_profile_close(T, m, MP, MPI, MP_exp, MPI_exp, eps=1e-8)


@pytest.mark.slow
def test_dataset_16384():
    # The reference's largest software-test config (16384, m=128, w=1024).
    T = load_dataset("16384.txt", "test")
    m = 128
    cfg = MatrixProfileConfig(
        m=m, dtype="float64", kernel="xla", band=1024, chunk=1024,
        tile_rows=8, tile_cols=8,
    )
    MP, MPI = compute_matrix_profile(T, config=cfg)
    MP_exp, MPI_exp = _golden(T, m)
    assert_profile_close(T, m, MP, MPI, MP_exp, MPI_exp, eps=1e-8)


def test_real_dataset_ecg():
    T = load_dataset("ecg-heartbeat-av.txt", "real")[:1500]
    m = 64
    cfg = MatrixProfileConfig(m=m, dtype="float64", kernel="xla",
                              band=256, chunk=512, tile_rows=8, tile_cols=8)
    MP, MPI = compute_matrix_profile(T, config=cfg)
    MP_exp, MPI_exp = _golden(T, m)
    assert_profile_close(T, m, MP, MPI, MP_exp, MPI_exp, eps=1e-8)
