"""Batched small-series tier: per-row oracle parity, group invariance,
mesh-sharded batch axis, validation, CLI."""

import numpy as np
import pytest

from mpx.batch import compute_batch_profiles
from mpx.config import MatrixProfileConfig
from mpx.reference import compute_matrix_profile_reference
from tests.helpers import assert_profile_close


def make_batch(B, n, seed=0):
    rng = np.random.default_rng(seed)
    return np.cumsum(rng.standard_normal((B, n)), axis=1)


def test_batch_rows_match_reference():
    B, n, m = 6, 320, 16
    batch = make_batch(B, n, seed=1)
    MP, MPI = compute_batch_profiles(batch, m)
    assert MP.shape == MPI.shape == (B, n - m + 1)
    for b in range(B):
        MPe, MPIe = compute_matrix_profile_reference(batch[b], m)
        assert_profile_close(batch[b], m, MP[b], MPI[b], MPe, MPIe, eps=2e-3)


def test_batch_f64_matches_reference():
    batch = make_batch(3, 260, seed=2)
    cfg = MatrixProfileConfig(m=24, dtype="float64")
    MP, MPI = compute_batch_profiles(batch, config=cfg)
    for b in range(3):
        MPe, MPIe = compute_matrix_profile_reference(batch[b], 24)
        np.testing.assert_allclose(MP[b], MPe, atol=1e-8)


def test_batch_group_invariance():
    batch = make_batch(7, 300, seed=3)
    base = compute_batch_profiles(batch, 16)
    for group in (1, 3, 7):
        got = compute_batch_profiles(batch, 16, group=group)
        np.testing.assert_array_equal(got[0], base[0])
        np.testing.assert_array_equal(got[1], base[1])


def test_batch_sharded_matches_single():
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs a multi-device mesh")
    batch = make_batch(6, 300, seed=4)  # B not divisible by shards
    base = compute_batch_profiles(batch, 16)
    cfg = MatrixProfileConfig(m=16, num_shards=4)
    got = compute_batch_profiles(batch, config=cfg)
    np.testing.assert_array_equal(got[0], base[0])
    np.testing.assert_array_equal(got[1], base[1])


def test_batch_validation():
    with pytest.raises(ValueError, match="2-D"):
        compute_batch_profiles(np.zeros(100), 8)
    with pytest.raises(ValueError, match="small series"):
        cfg = MatrixProfileConfig(m=8, dtype="float64")
        big = np.zeros((1, (1 << 16) + 8 + 10))
        compute_batch_profiles(big, config=cfg)
    with pytest.raises(ValueError, match="group"):
        compute_batch_profiles(make_batch(2, 100), 8, group=0)
    with pytest.raises(ValueError, match="2-D"):
        compute_batch_profiles(np.empty((0, 100)), 8)
    bad = make_batch(3, 100)
    bad[1, 50] = np.nan
    with pytest.raises(ValueError, match="non-finite"):
        compute_batch_profiles(bad, 8)
    with pytest.raises(ValueError, match="cannot batch"):
        cfg = MatrixProfileConfig(m=8, kernel="hybrid")
        compute_batch_profiles(make_batch(2, 100), config=cfg)


def test_batch_cli(tmp_path, capsys):
    from mpx.cli import main
    from mpx.io.tsb import read_binary, write_binary

    batch = make_batch(3, 280, seed=5)
    argv = ["batch", "-m", "16", "-o", str(tmp_path / "out")]
    for b in range(3):
        p = str(tmp_path / f"s{b}.tsb")
        write_binary(p, batch[b], "double")
        argv += ["-i", p]
    assert main(argv) == 0
    assert "3 profile pairs" in capsys.readouterr().out
    MPe, _ = compute_matrix_profile_reference(batch[1], 16)
    got = read_binary(str(tmp_path / "out.s1.mpb"), "double")
    np.testing.assert_allclose(got, MPe, atol=2e-3)
    # duplicate basenames are disambiguated, not overwritten
    sub = tmp_path / "sub"
    sub.mkdir()
    dup = str(sub / "s0.tsb")
    write_binary(dup, batch[2], "double")
    assert main(["batch", "-m", "16", "-o", str(tmp_path / "dup"),
                 "-i", str(tmp_path / "s0.tsb"), "-i", dup]) == 0
    a = read_binary(str(tmp_path / "dup.s0.0.mpb"), "double")
    b = read_binary(str(tmp_path / "dup.s0.1.mpb"), "double")
    assert not np.array_equal(a, b)
    # unequal lengths rejected
    short = str(tmp_path / "short.tsb")
    write_binary(short, batch[0][:200], "double")
    assert main(["batch", "-m", "16", "-i", short, "-i",
                 str(tmp_path / "s0.tsb")]) != 0
    assert "equal-length" in capsys.readouterr().err
