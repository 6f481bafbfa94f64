"""Validate the golden SCAMP oracle against a fully independent
brute-force z-normalized distance-matrix computation."""

import numpy as np
import pytest

from mpx.reference import (
    brute_force_matrix_profile,
    compute_matrix_profile_reference,
    exclusion_zone,
    rolling_statistics,
)
from tests.conftest import random_walk
from tests.helpers import assert_profile_close


@pytest.mark.parametrize("n,m", [(64, 8), (128, 16), (256, 16), (300, 32)])
def test_golden_matches_brute_force(n, m):
    T = random_walk(n, seed=n + m)
    MP, MPI = compute_matrix_profile_reference(T, m)
    MP_bf, MPI_bf = brute_force_matrix_profile(T, m)
    assert_profile_close(T, m, MP, MPI, MP_bf, MPI_bf, eps=1e-8)


def test_golden_sine_motif():
    # Two identical motifs embedded in noise must find each other.
    rng = np.random.default_rng(3)
    T = rng.standard_normal(512) * 0.05
    motif = np.sin(np.linspace(0, 4 * np.pi, 64))
    T[100:164] += motif
    T[400:464] += motif
    m = 64
    MP, MPI = compute_matrix_profile_reference(T, m)
    assert MP[100] < 1.0
    assert abs(int(MPI[100]) - 400) <= 2


def test_exclusion_zone_rule():
    assert exclusion_zone(16) == 4
    assert exclusion_zone(256) == 64
    # No subsequence may be its own (or a trivially-overlapping) neighbor.
    T = random_walk(128, seed=1)
    m = 16
    MP, MPI = compute_matrix_profile_reference(T, m)
    rows = np.arange(MP.shape[0])
    assert np.all(np.abs(MPI - rows) >= exclusion_zone(m))


def test_rolling_statistics_basics():
    T = random_walk(200, seed=7)
    m = 16
    mu, df, dg, inv = rolling_statistics(T, m)
    w = 200 - m + 1
    assert mu.shape == (w,)
    # mu matches direct window means
    windows = np.lib.stride_tricks.sliding_window_view(T, m)
    np.testing.assert_allclose(mu, windows.mean(axis=1), atol=1e-10)
    # inv matches direct centered norms
    cent = windows - windows.mean(axis=1, keepdims=True)
    np.testing.assert_allclose(
        inv, 1.0 / np.sqrt((cent * cent).sum(axis=1)), rtol=1e-10
    )
    assert df[0] == 0.0 and dg[0] == 0.0
