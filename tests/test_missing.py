"""Missing-data (gap) tier: masked semantics vs an independent
brute-force oracle, exactness away from gaps, CLI."""

import numpy as np
import pytest

from mpx.config import MatrixProfileConfig
from mpx.missing import compute_matrix_profile_masked, missing_window_mask
from mpx.reference import compute_matrix_profile_reference
from tests.conftest import random_walk

UNTOUCHED = lambda m: np.sqrt(2.0 * m * (1.0 + 1e12))


def masked_oracle(T, m):
    """Brute force over the TRUE series with gap windows excluded from
    both sides (independent of every mpx kernel)."""
    T = np.asarray(T, np.float64)
    n = T.shape[0]
    w = n - m + 1
    bad = missing_window_mask(T, m)
    Tf = np.where(np.isfinite(T), T, 0.0)
    W = np.lib.stride_tricks.sliding_window_view(Tf, m)
    c = W - W.mean(axis=1, keepdims=True)
    nrm = np.sqrt((c * c).sum(axis=1))
    good = ~bad & (nrm > 0)
    U = np.divide(c, nrm[:, None], out=np.zeros_like(c),
                  where=nrm[:, None] > 0)
    P = U @ U.T
    i = np.arange(w)
    valid = (np.abs(i[None, :] - i[:, None]) >= m // 4)
    valid &= good[:, None] & good[None, :]
    D2 = np.where(valid, 2 * m * (1 - np.clip(P, -1, 1)), np.inf)
    has = np.isfinite(D2).any(axis=1)
    MPI = np.where(has, D2.argmin(axis=1), -1).astype(np.int32)
    MP = np.where(has, np.sqrt(D2[i, np.clip(MPI, 0, w - 1)]),
                  UNTOUCHED(m))
    return MP, MPI, bad


def gapped_series(n=600, seed=7):
    T = random_walk(n, seed=seed)
    T[100:110] = np.nan
    T[400] = np.inf
    return T


@pytest.mark.parametrize("dtype,tol", [("float64", 1e-8), ("float32", 2e-3)])
def test_masked_matches_oracle(dtype, tol):
    T = gapped_series()
    m = 24
    cfg = MatrixProfileConfig(m=m, dtype=dtype, band=64, chunk=128,
                              tile_rows=8, tile_cols=64)
    MP, MPI = compute_matrix_profile_masked(T, config=cfg)
    MP = np.asarray(MP, np.float64)
    MPI = np.asarray(MPI)
    MPe, MPIe, bad = masked_oracle(T, m)
    # gap windows report the untouched sentinel and are never neighbors
    assert (MPI[bad] == -1).all()
    assert not np.isin(MPI[MPI >= 0], np.nonzero(bad)[0]).any()
    ok = MPIe >= 0
    assert np.abs(MP[ok] - MPe[ok]).max() <= tol
    assert (MPI[~ok] == -1).all()


def test_masked_exact_away_from_gaps():
    """Windows not overlapping a gap get EXACTLY the profile they would
    get if the join simply never contained the gap windows."""
    T = gapped_series(n=500, seed=9)
    m = 16
    cfg = MatrixProfileConfig(m=m, dtype="float64", band=64, chunk=64,
                              tile_rows=8, tile_cols=64)
    MP, MPI = compute_matrix_profile_masked(T, config=cfg)
    MPe, MPIe, bad = masked_oracle(T, m)
    ok = MPIe >= 0
    np.testing.assert_allclose(np.asarray(MP, np.float64)[ok],
                               MPe[ok], atol=1e-8)


def test_finite_input_short_circuits():
    T = random_walk(300, seed=3)
    cfg = MatrixProfileConfig(m=16, dtype="float64", band=64, chunk=64,
                              tile_rows=8, tile_cols=64)
    MP, MPI = compute_matrix_profile_masked(T, config=cfg)
    MPe, MPIe = compute_matrix_profile_reference(T, 16)
    np.testing.assert_allclose(np.asarray(MP, np.float64), MPe, atol=1e-8)


def test_masked_validation():
    with pytest.raises(ValueError, match="every window overlaps"):
        compute_matrix_profile_masked(np.full(100, np.nan), 8)
    T = gapped_series()
    with pytest.raises(ValueError, match="gaps"):
        cfg = MatrixProfileConfig(m=16, dtype="ap16")
        compute_matrix_profile_masked(T, config=cfg)


def test_masked_sharded_and_left_right():
    import jax

    T = gapped_series(n=700, seed=11)
    m = 16
    base_cfg = MatrixProfileConfig(m=m, dtype="float32", band=32,
                                   chunk=64, tile_rows=8, tile_cols=32)
    MP0, MPI0 = compute_matrix_profile_masked(T, config=base_cfg)
    if len(jax.devices()) >= 4:
        import dataclasses

        cfg = dataclasses.replace(base_cfg, num_shards=4)
        MP4, MPI4 = compute_matrix_profile_masked(T, config=cfg)
        np.testing.assert_array_equal(np.asarray(MP0), np.asarray(MP4))
    mpl, mpli, mpr, mpri = compute_matrix_profile_masked(
        T, config=base_cfg, left_right=True)
    bad = missing_window_mask(T, m)
    assert (np.asarray(mpli)[bad] == -1).all()
    assert (np.asarray(mpri)[bad] == -1).all()


def test_masked_cli(tmp_path, capsys):
    from mpx.cli import main
    from mpx.io.tsb import read_binary, write_binary

    T = gapped_series()
    inp = str(tmp_path / "g.tsb")
    write_binary(inp, T, "double")
    # default: rejected
    assert main(["compute", "-i", inp, "-m", "24"]) != 0
    assert "non-finite" in capsys.readouterr().err
    # masked: succeeds and matches the oracle
    out = str(tmp_path / "res")
    assert main(["compute", "-i", inp, "-m", "24", "--allow-missing",
                 "--dtype", "double", "-o", out]) == 0
    MPe, MPIe, bad = masked_oracle(T, 24)
    got = read_binary(out + ".mpb", "double")
    ok = MPIe >= 0
    np.testing.assert_allclose(got[ok], MPe[ok], atol=1e-8)


def test_masked_rejects_ring_mode():
    T = gapped_series()
    cfg = MatrixProfileConfig(m=16, shard_mode="ring")
    with pytest.raises(ValueError, match="ring"):
        compute_matrix_profile_masked(T, config=cfg)
    # driver-level guard: external stats + ring is an error everywhere
    from mpx.driver import compute_matrix_profile
    from mpx.ops.precompute import precompute_statistics

    clean = random_walk(200, seed=1)
    cfg2 = MatrixProfileConfig(m=16, shard_mode="ring", band=32, chunk=64)
    stats = precompute_statistics(clean, 16, band=32, chunk=64,
                                  dtype="float32")
    with pytest.raises(ValueError, match="externally-provided stats"):
        compute_matrix_profile(clean, config=cfg2, stats=stats)
