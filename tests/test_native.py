"""Native C++ host library vs the Python oracles."""

import numpy as np
import pytest

from mpx import native
from mpx.ops.precompute import precompute_statistics_numpy
from mpx.reference import compute_matrix_profile_reference
from tests.conftest import random_walk
from tests.helpers import assert_profile_close

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native toolchain unavailable"
)


def test_native_precompute_matches_numpy():
    T = random_walk(2048, seed=8)
    m = 64
    got = native.precompute(T, m)
    ref = precompute_statistics_numpy(T, m)
    for name in ("mu", "df", "dg", "inv", "qt0"):
        np.testing.assert_allclose(got[name], ref[name], rtol=1e-10, atol=1e-10,
                                   err_msg=name)


@pytest.mark.parametrize("n,m", [(2048, 64), (1037, 33), (521, 7), (64, 64)])
def test_native_precompute_stats_matches_full(n, m):
    """mu bit-identical (same rolling recurrence), inv within
    reassociation rounding, degenerate classification identical."""
    T = random_walk(n, seed=n + m)
    got = native.precompute_stats(T, m)
    ref = native.precompute(T, m)
    np.testing.assert_array_equal(got["mu"], ref["mu"])
    fin = np.isfinite(ref["inv"])
    np.testing.assert_array_equal(fin, np.isfinite(got["inv"]))
    np.testing.assert_allclose(got["inv"][fin], ref["inv"][fin],
                               rtol=1e-12, atol=0)


def test_native_precompute_stats_degenerate_classification():
    """Constant stretches classify identically to the full kernel and
    the numpy estimator (inv = inf, excluded outright downstream)."""
    rng = np.random.default_rng(5)
    T = np.concatenate([np.ones(300), np.cumsum(rng.standard_normal(700)),
                        np.full(80, -3.5)])
    m = 48
    got = native.precompute_stats(T, m)
    ref = precompute_statistics_numpy(T, m)
    np.testing.assert_array_equal(
        np.isfinite(got["inv"]), np.isfinite(ref["inv"]))
    assert np.isinf(got["inv"]).any()


@pytest.mark.parametrize("n,m", [(512, 16), (2048, 64)])
def test_native_golden_matches_python_golden(n, m):
    T = random_walk(n, seed=n)
    MP_c, MPI_c = native.golden_scamp(T, m)
    MP_py, MPI_py = compute_matrix_profile_reference(T, m)
    assert_profile_close(T, m, MP_c, MPI_c, MP_py, MPI_py, eps=1e-8)


def test_native_merge():
    a_val = np.array([1.0, 5.0, -2.0])
    a_idx = np.array([1, 2, 3], np.int32)
    b_val = np.array([2.0, 4.0, -1.0])
    b_idx = np.array([7, 8, 9], np.int32)
    val, idx = native.merge_aggregates(a_val, a_idx, b_val, b_idx)
    np.testing.assert_array_equal(val, [2.0, 5.0, -1.0])
    np.testing.assert_array_equal(idx, [7, 2, 9])
