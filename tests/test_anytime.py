"""Anytime/approximate tier: monotone convergence to the exact profile."""

import numpy as np
import pytest

from mpx import MatrixProfileConfig, compute_matrix_profile
from mpx.anytime import anytime_matrix_profile, approx_matrix_profile


def _cfg(**kw):
    kw.setdefault("m", 24)
    kw.setdefault("dtype", "float32")
    kw.setdefault("band", 32)
    kw.setdefault("chunk", 64)
    kw.setdefault("kernel", "mxu")
    return MatrixProfileConfig(**kw)


@pytest.mark.parametrize("order", ["shuffled", "diagonal"])
def test_anytime_converges_to_exact(order):
    rng = np.random.default_rng(71)
    T = np.cumsum(rng.standard_normal(700))
    cfg = _cfg()
    MPx, MPIx = compute_matrix_profile(T, config=cfg)
    MPx = np.asarray(MPx, np.float64)

    prev = None
    fracs = []
    for MP, MPI, frac in anytime_matrix_profile(T, config=cfg, batches=5,
                                                order=order):
        MP = np.asarray(MP, np.float64)
        fracs.append(frac)
        # upper bound on the exact profile, and monotone non-increasing
        assert (MP >= MPx - 1e-6).all()
        if prev is not None:
            assert (MP <= prev + 1e-6).all()
        prev = MP
    assert fracs[-1] == 1.0 and len(fracs) == 5
    assert sorted(fracs) == fracs
    # full coverage == the exact profile (ties may pick another
    # equidistant neighbor depending on merge order)
    np.testing.assert_allclose(prev, MPx, atol=1e-6)
    mism = np.asarray(MPI) != np.asarray(MPIx)
    assert np.allclose(prev[mism], MPx[mism], atol=1e-5)


def test_approx_one_shot_fraction():
    rng = np.random.default_rng(73)
    T = np.cumsum(rng.standard_normal(900))
    cfg = _cfg()
    MP, MPI, frac = approx_matrix_profile(T, config=cfg, fraction=0.25)
    assert 0.15 <= frac <= 0.45  # one batch of ~1/4 of the jobs
    MPx, _ = compute_matrix_profile(T, config=cfg)
    assert (np.asarray(MP, np.float64)
            >= np.asarray(MPx, np.float64) - 1e-6).all()
    # sanity on usefulness: at 25% coverage most windows already have
    # SOME candidate (finite distance)
    assert np.isfinite(np.asarray(MP)).mean() > 0.9
    with pytest.raises(ValueError, match="fraction"):
        approx_matrix_profile(T, config=cfg, fraction=0.0)


def test_anytime_f64_strict_tier():
    from mpx.reference import compute_matrix_profile_reference

    rng = np.random.default_rng(79)
    T = np.cumsum(rng.standard_normal(420))
    cfg = _cfg(m=16, dtype="float64", kernel="auto")
    *_, (MP, MPI, frac) = anytime_matrix_profile(T, config=cfg, batches=3)
    assert frac == 1.0
    gMP, _ = compute_matrix_profile_reference(T, 16)
    np.testing.assert_allclose(np.asarray(MP, np.float64), gMP, atol=1e-8)


def test_cli_approx(tmp_path, capsys):
    from mpx.cli import main
    from mpx.io.tsb import read_binary, write_binary

    rng = np.random.default_rng(83)
    T = np.cumsum(rng.standard_normal(800))
    src = str(tmp_path / "t.tsb")
    write_binary(src, T, "double")
    out = str(tmp_path / "res")
    rc = main(["compute", "-i", src, "-m", "24", "--approx", "0.3",
               "--band", "32", "--chunk", "64", "-o", out])
    assert rc == 0
    approx = read_binary(out + ".mpb")
    MPx, _ = compute_matrix_profile(T, config=_cfg())
    assert (approx.astype(np.float64)
            >= np.asarray(MPx, np.float64) - 1e-5).all()
    # invalid combos rejected up front
    with pytest.raises(SystemExit):
        main(["compute", "-i", src, "-m", "24", "--approx", "0.3",
              "--checkpoint", str(tmp_path / "c.npz")])
