"""Randomized configuration fuzzing vs the golden oracle: random sizes,
subsequence lengths, and job geometries, float64 at 1e-8."""

import numpy as np
import pytest

from mpx import MatrixProfileConfig, compute_matrix_profile
from mpx.reference import compute_matrix_profile_reference
from tests.conftest import random_walk
from tests.helpers import assert_profile_close


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_configs_f64(seed):
    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(64, 900))
    m = int(rng.integers(4, max(5, min(64, n // 3))))
    band = int(rng.choice([8, 16, 32, 64, 128]))
    chunk = int(rng.choice([8, 16, 32, 64, 128, 256]))
    kernel = str(rng.choice(["mxu", "xla", "hybrid"]))
    T = random_walk(n, seed=seed * 7 + 1)
    if rng.random() < 0.3:
        # inject a constant segment (degenerate windows)
        a = int(rng.integers(0, n - m - 1))
        T[a : a + m + 2] = T[a]
    cfg = MatrixProfileConfig(
        m=m, dtype="float64", kernel=kernel, band=band, chunk=chunk,
        tile_rows=8, tile_cols=8,
    )
    MP, MPI = compute_matrix_profile(T, config=cfg)
    MP_exp, MPI_exp = compute_matrix_profile_reference(T, m)
    w = n - m + 1
    # Degenerate windows diverge from the golden by design (mpx skips
    # inf/NaN correlations; the golden lets them poison comparisons), so
    # compare only rows whose golden value is finite and whose golden
    # neighbor is non-degenerate.
    from mpx.ops.precompute import precompute_statistics_numpy

    inv = precompute_statistics_numpy(T, m)["inv"]
    degenerate = ~np.isfinite(inv)
    exp_ok = (
        np.isfinite(MP_exp)
        & ~degenerate
        & (MPI_exp >= 0)
        & ~degenerate[np.clip(MPI_exp, 0, w - 1)]
    )
    got = np.asarray(MP, np.float64)
    np.testing.assert_allclose(
        got[exp_ok], MP_exp[exp_ok], atol=1e-8,
        err_msg=f"n={n} m={m} band={band} chunk={chunk} kernel={kernel}",
    )


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_configs_f32_hybrid_route(seed, monkeypatch):
    """The float32 'auto' hybrid route (exact f64 cast down) across
    random sizes/geometries, at f32-cast tolerance vs the golden."""
    import mpx.kernels as K

    monkeypatch.setattr(K, "HYBRID32_MIN_W", 16)
    rng = np.random.default_rng(2000 + seed)
    n = int(rng.integers(96, 900))
    m = int(rng.integers(4, max(5, min(64, n // 3))))
    band = int(rng.choice([16, 32, 64, 128]))
    chunk = int(rng.choice([32, 64, 128, 256]))
    T = random_walk(n, seed=seed * 11 + 5)
    if rng.random() < 0.3:
        a = int(rng.integers(0, n - m - 1))
        T[a : a + m + 2] = T[a]
    cfg = MatrixProfileConfig(
        m=m, dtype="float32", kernel="auto", band=band, chunk=chunk,
        tile_rows=8, tile_cols=8,
    )
    MP, MPI = compute_matrix_profile(T, config=cfg)
    assert np.asarray(MP).dtype == np.float32
    MP_exp, MPI_exp = compute_matrix_profile_reference(T, m)
    w = n - m + 1
    from mpx.ops.precompute import precompute_statistics_numpy

    inv = precompute_statistics_numpy(T, m)["inv"]
    degenerate = ~np.isfinite(inv)
    exp_ok = (
        np.isfinite(MP_exp)
        & ~degenerate
        & (MPI_exp >= 0)
        & ~degenerate[np.clip(MPI_exp, 0, w - 1)]
    )
    got = np.asarray(MP, np.float64)
    np.testing.assert_allclose(
        got[exp_ok], MP_exp[exp_ok], atol=1e-5,
        err_msg=f"n={n} m={m} band={band} chunk={chunk}",
    )
