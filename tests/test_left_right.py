"""Left/right matrix profiles vs a brute-force oracle."""

import numpy as np
import pytest

from mpx import MatrixProfileConfig, compute_matrix_profile
from mpx.reference import exclusion_zone, znormalized_distance_matrix
from tests.conftest import random_walk


def brute_force_left_right(T, m):
    D = znormalized_distance_matrix(T, m)
    w = D.shape[0]
    excl = exclusion_zone(m)
    i, j = np.meshgrid(np.arange(w), np.arange(w), indexing="ij")
    D = np.where(np.abs(i - j) < excl, np.inf, D)
    D = np.where(np.isnan(D), np.inf, D)
    DL = np.where(j < i, D, np.inf)   # neighbors strictly earlier
    DR = np.where(j > i, D, np.inf)   # neighbors strictly later
    mpl = DL.min(axis=1)
    mpr = DR.min(axis=1)
    mpli = np.where(np.isfinite(mpl), DL.argmin(axis=1), -1)
    mpri = np.where(np.isfinite(mpr), DR.argmin(axis=1), -1)
    return mpl, mpli, mpr, mpri


@pytest.mark.parametrize("kernel", ["mxu", "xla"])
def test_left_right_profiles(kernel):
    n, m = 512, 16
    T = random_walk(n, seed=51)
    cfg = MatrixProfileConfig(m=m, dtype="float64", kernel=kernel,
                              band=64, chunk=128, tile_rows=8, tile_cols=8)
    mpl, mpli, mpr, mpri = compute_matrix_profile(
        T, config=cfg, left_right=True
    )
    bl, bli, br, bri = brute_force_left_right(T, m)

    got_l = np.asarray(mpl, np.float64)
    got_r = np.asarray(mpr, np.float64)
    fin_l = np.isfinite(bl)
    fin_r = np.isfinite(br)
    np.testing.assert_allclose(got_l[fin_l], bl[fin_l], atol=1e-8)
    np.testing.assert_allclose(got_r[fin_r], br[fin_r], atol=1e-8)
    # untouched entries keep the sentinel
    assert np.all(np.asarray(mpli)[~fin_l] == -1)
    assert np.all(np.asarray(mpri)[~fin_r] == -1)
    # index ties: distances must agree
    for got_i, exp_i, got_d, exp_d in [
        (np.asarray(mpli)[fin_l], bli[fin_l], got_l[fin_l], bl[fin_l]),
        (np.asarray(mpri)[fin_r], bri[fin_r], got_r[fin_r], br[fin_r]),
    ]:
        diff = got_i != exp_i
        assert np.all(np.abs(got_d[diff] - exp_d[diff]) <= 1e-8)
