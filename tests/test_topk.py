"""k-NN matrix profile vs a brute-force top-k oracle."""

import numpy as np
import pytest

from mpx import MatrixProfileConfig
from mpx.reference import exclusion_zone, znormalized_distance_matrix
from mpx.topk import compute_topk_profile
from tests.conftest import random_walk


def brute_force_topk(T, m, k):
    D = znormalized_distance_matrix(T, m)
    w = D.shape[0]
    excl = exclusion_zone(m)
    i, j = np.meshgrid(np.arange(w), np.arange(w), indexing="ij")
    D = np.where(np.abs(i - j) < excl, np.inf, D)
    D = np.where(np.isnan(D), np.inf, D)
    idx = np.argsort(D, axis=1, kind="stable")[:, :k]
    dist = np.take_along_axis(D, idx, axis=1)
    idx = np.where(np.isfinite(dist), idx, -1)
    return dist, idx


@pytest.mark.parametrize("n,m,k", [(300, 16, 4), (512, 32, 8), (256, 8, 1)])
def test_topk_matches_brute_force(n, m, k):
    T = random_walk(n, seed=n + k)
    cfg = MatrixProfileConfig(m=m, dtype="float64", kernel="mxu",
                              band=64, chunk=128, tile_rows=8, tile_cols=8)
    D, I = compute_topk_profile(T, k=k, config=cfg)
    D = np.asarray(D, np.float64)
    I = np.asarray(I)
    De, Ie = brute_force_topk(T, m, k)

    fin = np.isfinite(De)
    np.testing.assert_allclose(D[fin], De[fin], atol=1e-8)
    assert np.all(np.isinf(D[~fin]))
    # indices may differ only where distances tie
    diff = (I != Ie) & fin
    assert np.all(np.abs(D[diff] - De[diff]) <= 1e-8)
    # sorted ascending
    assert np.all(np.diff(D, axis=1) >= -1e-12)


def test_topk_k1_matches_profile():
    from mpx import compute_matrix_profile

    T = random_walk(400, seed=9)
    cfg = MatrixProfileConfig(m=16, dtype="float64", kernel="mxu",
                              band=64, chunk=64)
    D, I = compute_topk_profile(T, k=1, config=cfg)
    MP, MPI = compute_matrix_profile(T, config=cfg)
    np.testing.assert_allclose(
        np.asarray(D)[:, 0], np.asarray(MP), atol=1e-10
    )
