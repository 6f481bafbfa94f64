"""Contrast profile vs the brute-force oracle + planted-pattern recovery."""

import numpy as np
import pytest

from mpx import MatrixProfileConfig
from mpx.contrast import (
    best_contrast,
    brute_force_contrast_profile,
    contrast_profile,
    pan_contrast_profile,
    top_contrast_motifs,
)
from tests.conftest import random_walk


def _planted_pair(n=900, m=64, seed=3):
    """T+ has a sine pattern planted twice; T- is pattern-free noise."""
    rng = np.random.default_rng(seed)
    Tp = rng.standard_normal(n) * 0.05
    Tm = rng.standard_normal(n) * 0.05
    pattern = np.sin(np.linspace(0, 4 * np.pi, m))
    second = min(600, n - m - 10)
    Tp[100 : 100 + m] += pattern
    Tp[second : second + m] += pattern
    return Tp, Tm, m


@pytest.mark.parametrize("dtype", ["float64", "float32"])
def test_contrast_matches_brute_force(dtype):
    Tp = random_walk(400, seed=11)
    Tm = random_walk(350, seed=12)
    m = 32
    cfg = MatrixProfileConfig(m=m, dtype=dtype, kernel="mxu",
                              band=128, chunk=128)
    res = contrast_profile(Tp, Tm, config=cfg)
    expect = brute_force_contrast_profile(Tp, Tm, m)
    atol = 1e-8 if dtype == "float64" else 5e-4
    np.testing.assert_allclose(res.cp, expect, atol=atol)
    assert res.cp.shape == (Tp.shape[0] - m + 1,)
    assert np.all(res.cp >= 0.0) and np.all(res.cp <= 1.0)


def test_contrast_finds_planted_pattern():
    Tp, Tm, m = _planted_pair()
    cfg = MatrixProfileConfig(m=m, dtype="float64", band=256, chunk=256)
    res = contrast_profile(Tp, Tm, config=cfg)
    motifs = top_contrast_motifs(res, m, k=2)
    assert motifs, "no contrast motif found"
    top = motifs[0]
    assert top.score > 0.5
    # the peak and its neighbor each OVERLAP a planted site (windows
    # partially covering the pattern legitimately score near the top,
    # either order)
    got = sorted((top.index, top.neighbor))
    assert abs(got[0] - 100) < m and abs(got[1] - 600) < m
    # suppression: second motif (if any) is outside the m/2 zones
    for extra in motifs[1:]:
        assert min(abs(extra.index - top.index),
                   abs(extra.index - top.neighbor)) >= m // 2


def test_contrast_zero_when_pattern_in_both():
    """A pattern present in BOTH series is not contrastive."""
    rng = np.random.default_rng(7)
    m = 64
    Tp = rng.standard_normal(700) * 0.05
    Tm = rng.standard_normal(700) * 0.05
    pattern = np.sin(np.linspace(0, 4 * np.pi, m))
    Tp[100 : 100 + m] += pattern
    Tp[400 : 400 + m] += pattern
    Tm[250 : 250 + m] += pattern
    cfg = MatrixProfileConfig(m=m, dtype="float64", band=256, chunk=256)
    res = contrast_profile(Tp, Tm, config=cfg)
    assert res.cp[100] < 0.05 and res.cp[400] < 0.05


def test_contrast_flat_windows_masked():
    Tp = random_walk(300, seed=5)
    Tp[50:120] = 2.5  # constant run -> flat windows
    Tm = random_walk(300, seed=6)
    m = 32
    cfg = MatrixProfileConfig(m=m, dtype="float64", band=128, chunk=128)
    res = contrast_profile(Tp, Tm, config=cfg)
    # windows fully inside the constant run have no valid z-norm distance
    assert np.all(res.cp[60 : 120 - m] == 0.0)
    assert np.all(res.cp >= 0.0) and np.all(res.cp <= 1.0)


def test_pan_contrast_picks_planted_window():
    Tp, Tm, m = _planted_pair()
    cfg = MatrixProfileConfig(m=8, dtype="float64", band=256, chunk=256)
    pan = pan_contrast_profile(Tp, Tm, [m // 2, m, 2 * m], config=cfg)
    assert [row[0] for row in pan] == sorted({m // 2, m, 2 * m})
    best_m, best_i, score = best_contrast(pan)
    assert score > 0.5
    # the winning window (length best_m) overlaps a planted site
    span = range(best_i, best_i + best_m)
    assert (span.start < 100 + m and span.stop > 100) or (
        span.start < 600 + m and span.stop > 600)


def test_contrast_m_conflict_raises():
    cfg = MatrixProfileConfig(m=16)
    with pytest.raises(ValueError):
        contrast_profile(np.zeros(64), np.zeros(64), m=32, config=cfg)


def test_cli_contrast(tmp_path, capsys):
    from mpx.cli import main
    from mpx.io.tsb import write_binary

    Tp, Tm, m = _planted_pair(n=500, m=32, seed=9)
    write_binary(str(tmp_path / "p.tsb"), Tp, "double")
    write_binary(str(tmp_path / "n.tsb"), Tm, "double")
    out = str(tmp_path / "res")
    rc = main(["contrast", "-p", str(tmp_path / "p.tsb"),
               "-n", str(tmp_path / "n.tsb"), "-m", str(m), "-k", "2",
               "--dtype", "double", "--band", "128", "--chunk", "128",
               "-o", out])
    assert rc == 0
    assert "contrast motif @" in capsys.readouterr().out
    cp = np.load(out + ".cp.npy")
    assert cp.shape == (Tp.shape[0] - m + 1,)

    rc = main(["contrast", "-p", str(tmp_path / "p.tsb"),
               "-n", str(tmp_path / "n.tsb"), "--pan", "16,32",
               "--dtype", "double", "--band", "128", "--chunk", "128"])
    assert rc == 0
    assert "best contrast" in capsys.readouterr().out


def test_no_comparable_minus_content_is_maximally_contrastive():
    """A constant T- has no valid windows: every repeated T+ pattern is
    absent from the minus class, so CP = 1 there (not 0)."""
    rng = np.random.default_rng(11)
    m = 24
    Tp = rng.normal(0, 0.5, 400)
    pat = np.sin(np.linspace(0, 3 * np.pi, m))
    Tp[50 : 50 + m] += 2 * pat
    Tp[300 : 300 + m] += 2 * pat
    Tm = np.zeros(400)
    cfg = MatrixProfileConfig(m=m, dtype="float64", band=64, chunk=128,
                              tile_rows=8, tile_cols=16)
    res = contrast_profile(Tp, Tm, config=cfg)
    assert np.all(res.mpi_ab == -1)
    assert res.cp[50] == 1.0 and res.cp[300] == 1.0
    np.testing.assert_allclose(
        res.cp, brute_force_contrast_profile(Tp, Tm, m), atol=1e-8)
