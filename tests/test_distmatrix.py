"""Pooled distance-matrix summaries vs the dense numpy oracle."""

import numpy as np
import pytest

from mpx.distmatrix import brute_force_pooled_matrix, pooled_matrix


def _walk(n, seed):
    return np.cumsum(np.random.default_rng(seed).standard_normal(n))


@pytest.mark.parametrize("mh,mw", [(10, 10), (7, 13), (1, 1), (64, 3)])
def test_selfjoin_matrix_matches_oracle(mh, mw):
    T = _walk(700, 3)
    got = pooled_matrix(T, 24, mwidth=mw, mheight=mh)
    exp = brute_force_pooled_matrix(T, 24, mwidth=mw, mheight=mh)
    assert got.shape == (mh, mw)
    np.testing.assert_allclose(got, exp, atol=2e-3)


def test_selfjoin_matrix_pearson_and_symmetry():
    T = _walk(512, 4)
    got = pooled_matrix(T, 16, mwidth=12, mheight=12, pearson=True)
    exp = brute_force_pooled_matrix(T, 16, mwidth=12, mheight=12,
                                    pearson=True)
    np.testing.assert_allclose(got, exp, atol=2e-3)
    # square pooling of a self-join is symmetric
    np.testing.assert_allclose(got, got.T, atol=2e-3)


def test_matrix_finer_than_w_identity_pooling():
    # mheight > w forces pool=1 (identity): cells beyond w-1 stay empty
    T = _walk(80, 5)
    m = 8
    w = 80 - m + 1
    got = pooled_matrix(T, m, mwidth=90, mheight=90, pearson=True)
    exp = brute_force_pooled_matrix(T, m, mwidth=90, mheight=90,
                                    pearson=True)
    np.testing.assert_allclose(got, exp, atol=2e-3)
    assert (got[w:, :] == -1.0).all() and (got[:, w:] == -1.0).all()


def test_abjoin_matrix_matches_oracle():
    A, B = _walk(700, 6), _walk(500, 7)
    got = pooled_matrix(A, 24, mwidth=9, mheight=11, B=B)
    exp = brute_force_pooled_matrix(A, 24, mwidth=9, mheight=11, B=B)
    np.testing.assert_allclose(got, exp, atol=2e-3)


def test_empty_cells_read_floor():
    # tiny series, huge exclusion zone: near-diagonal cells are empty
    T = _walk(64, 8)
    m = 32  # excl = 8, w = 33
    got = pooled_matrix(T, m, mwidth=33, mheight=33, pearson=True)
    exp = brute_force_pooled_matrix(T, m, mwidth=33, mheight=33,
                                    pearson=True)
    np.testing.assert_allclose(got, exp, atol=2e-3)
    assert got[0, 0] == -1.0  # inside the exclusion zone


def test_grouped_dispatches_match_single():
    from mpx.config import MatrixProfileConfig

    T = _walk(900, 9)
    one = pooled_matrix(T, 16, mwidth=10, mheight=10)
    few = pooled_matrix(
        T, 16, mwidth=10, mheight=10,
        config=MatrixProfileConfig(m=16, band=128, chunk=128,
                                   dispatch_group=3),
    )
    np.testing.assert_allclose(one, few, atol=2e-3)
