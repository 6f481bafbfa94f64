"""Precompute statistics: vectorized production paths vs the golden
rolling statistics (reference semantics, HostSideComputation.hpp:20-45)."""

import numpy as np
import pytest

from mpx.ops.precompute import precompute_statistics, precompute_statistics_numpy
from mpx.reference import rolling_statistics
from tests.conftest import random_walk


@pytest.mark.parametrize("n,m", [(128, 16), (1024, 32), (4096, 128)])
def test_numpy_precompute_matches_golden(n, m):
    T = random_walk(n, seed=n)
    stats = precompute_statistics_numpy(T, m)
    mu, df, dg, inv = rolling_statistics(T, m)
    np.testing.assert_allclose(stats["mu"], mu, rtol=0, atol=1e-9)
    np.testing.assert_allclose(stats["df"], df, rtol=0, atol=1e-9)
    np.testing.assert_allclose(stats["dg"], dg, rtol=0, atol=1e-9)
    np.testing.assert_allclose(stats["inv"], inv, rtol=1e-9, atol=0)

    # qt0 against the direct first-row dot products
    w = n - m + 1
    windows = np.lib.stride_tricks.sliding_window_view(np.asarray(T, np.float64), m)
    qt0_direct = (windows - mu[:, None]) @ (T[:m] - mu[0])
    np.testing.assert_allclose(stats["qt0"], qt0_direct, rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("dtype", ["float32", "float64"])
def test_jax_precompute_matches_numpy(dtype):
    n, m = 1024, 32
    T = random_walk(n, seed=5)
    ref = precompute_statistics_numpy(T, m)
    stats = precompute_statistics(T, m, band=256, chunk=512, dtype=dtype)
    w = n - m + 1
    tol = 1e-10 if dtype == "float64" else 1e-4
    for name in ("mu", "df", "dg", "inv", "qt0"):
        got = np.asarray(getattr(stats, name))[:w]
        scale = max(1.0, np.abs(ref[name]).max())
        np.testing.assert_allclose(
            got, ref[name].astype(got.dtype), rtol=0, atol=tol * scale,
            err_msg=name,
        )
    # Padding is zero-filled
    for name in ("df", "dg", "inv", "qt0"):
        arr = np.asarray(getattr(stats, name))
        assert np.all(arr[w:] == 0), name


def test_zero_variance_window_gives_inf_inv():
    T = random_walk(256, seed=2)
    T[50:80] = 3.14  # constant segment longer than m
    stats = precompute_statistics_numpy(T, 16)
    assert np.isinf(stats["inv"]).any()
    # everything else stays finite
    assert np.isfinite(stats["mu"]).all()
    assert np.isfinite(stats["df"]).all()
