"""Multi-device job sharding on the 8-virtual-CPU-device mesh: results
must be identical (modulo equidistant ties) to single-device runs —
the MP_KERNEL_REPL analog (SURVEY §2 'Replication / parallelism config')."""

import jax
import numpy as np
import pytest

from mpx import MatrixProfileConfig, compute_matrix_profile
from mpx.config import make_job_grid, pad_job_grid
from mpx.reference import compute_matrix_profile_reference
from tests.conftest import random_walk
from tests.helpers import assert_profile_close


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("num_shards", [2, 8])
def test_sharded_matches_golden(num_shards):
    n, m = 1024, 32
    T = random_walk(n, seed=11)
    cfg = MatrixProfileConfig(
        m=m, dtype="float64", kernel="xla", band=64, chunk=128,
        tile_rows=8, tile_cols=8, num_shards=num_shards,
    )
    MP, MPI = compute_matrix_profile(T, config=cfg)
    MP_exp, MPI_exp = compute_matrix_profile_reference(T, m)
    assert_profile_close(T, m, MP, MPI, MP_exp, MPI_exp, eps=1e-8)


def test_sharded_matches_single_device():
    n, m = 512, 16
    T = random_walk(n, seed=13)
    base = dict(m=m, dtype="float32", kernel="xla", band=64, chunk=64,
                tile_rows=8, tile_cols=8)
    MP1, _ = compute_matrix_profile(T, config=MatrixProfileConfig(**base))
    MP8, _ = compute_matrix_profile(
        T, config=MatrixProfileConfig(**base, num_shards=8)
    )
    np.testing.assert_allclose(np.asarray(MP1), np.asarray(MP8), atol=1e-5)


def test_job_grid_padding():
    grid = make_job_grid(w=1000, band=64, chunk=256)
    padded = pad_job_grid(grid, 8, dummy_r0=1000)
    assert padded.r0.shape[0] % 8 == 0
    assert np.all(padded.r0[grid.r0.shape[0]:] == 1000)
    # jobs cover the triangle exactly: sum of per-chunk row counts
    expected = sum(
        -(-(1000 - k0) // 64) for k0 in range(0, 1000, 256)
    )
    assert grid.r0.shape[0] == expected


def test_sharded_mxu_kernel_matches_golden():
    n, m = 1024, 32
    T = random_walk(n, seed=23)
    cfg = MatrixProfileConfig(
        m=m, dtype="float64", kernel="mxu", band=64, chunk=128,
        tile_rows=8, tile_cols=8, num_shards=8,
    )
    MP, MPI = compute_matrix_profile(T, config=cfg)
    MP_exp, MPI_exp = compute_matrix_profile_reference(T, m)
    assert_profile_close(T, m, MP, MPI, MP_exp, MPI_exp, eps=1e-8)
