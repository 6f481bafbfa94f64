"""Pan matrix profile (mpx/pan.py): the profile surface over a range
of window sizes, each row exact vs the single-m path."""

import numpy as np
import pytest

from mpx.cli import main
from mpx.config import MatrixProfileConfig
from mpx.driver import compute_matrix_profile
from mpx.pan import compute_pan_profile, pan_m_range

from tests.conftest import random_walk


def test_pan_rows_match_single_m():
    T = random_walk(600, seed=13)
    ms = [16, 24, 48]
    cfg = MatrixProfileConfig(m=16, dtype="float64", band=64, chunk=128,
                              tile_rows=8, tile_cols=64)
    pan = compute_pan_profile(T, ms, config=cfg)
    assert pan.PMP.shape == (3, 600 - 16 + 1)
    for r, m in enumerate(ms):
        from dataclasses import replace

        MP, MPI = compute_matrix_profile(T, config=replace(cfg, m=m))
        wm = 600 - m + 1
        np.testing.assert_array_equal(pan.PMP[r, :wm], np.asarray(MP))
        np.testing.assert_array_equal(pan.PMPI[r, :wm], np.asarray(MPI))
        assert np.isinf(pan.PMP[r, wm:]).all()
        assert (pan.PMPI[r, wm:] == -1).all()


def test_pan_normalization_and_motif_scale():
    """A planted motif at length ~64 makes the normalized surface dip
    most at the window sizes that straddle it."""
    rng = np.random.default_rng(2)
    T = rng.standard_normal(900) * 0.2
    pat = np.sin(np.linspace(0, 3 * np.pi, 64))
    T[100:164] += pat
    T[700:764] += pat
    cfg = MatrixProfileConfig(m=8, dtype="float64", band=128, chunk=256,
                              tile_rows=8, tile_cols=128)
    pan = compute_pan_profile(T, [8, 64], config=cfg)
    norm = pan.normalized
    assert np.nanmin(norm) >= 0 and np.nanmax(norm[np.isfinite(pan.PMP)]) <= 1 + 1e-9
    # the m=64 row's minimum sits AT a planted motif occurrence and
    # stands far out of that row's background
    best = int(np.nanargmin(norm[1]))
    assert abs(best - 100) <= 8 or abs(best - 700) <= 8
    assert np.nanmin(norm[1]) < 0.4 * np.nanmedian(norm[1])


def test_pan_m_range_and_validation():
    ms = pan_m_range(8, 512, 10)
    assert ms[0] == 8 and ms[-1] == 512
    assert (np.diff(ms) > 0).all()
    with pytest.raises(ValueError):
        pan_m_range(2, 64)
    with pytest.raises(ValueError):
        pan_m_range(64, 8)
    with pytest.raises(ValueError):
        compute_pan_profile(random_walk(64), [64])  # no pairs at m=64
    with pytest.raises(ValueError):
        compute_pan_profile(random_walk(64), [])


def test_pan_cli(tmp_path, capsys):
    from mpx.io.tsb import write_binary

    T = random_walk(400, seed=7)
    write_binary(str(tmp_path / "t.tsb"), T, "double")
    assert main([
        "pan", "-i", str(tmp_path / "t.tsb"), "--m-lo", "8", "--m-hi", "32",
        "--count", "3", "-o", str(tmp_path / "out"),
    ]) == 0
    z = np.load(str(tmp_path / "out.pan.npz"))
    assert z["ms"].size == 3 and z["PMP"].shape[0] == 3
    assert main([
        "pan", "-i", str(tmp_path / "t.tsb"), "--m-lo", "8", "--m-hi", "16",
        "--count", "2",
    ]) == 0
    assert "min(normalized distance)" in capsys.readouterr().out


def test_pan_fused_matches_exact():
    """The fused all-levels kernel must match per-m exact profiles at
    f32 tolerance (index ties resolved by distance equality)."""
    from tests.helpers import assert_profile_close

    T = random_walk(1500, seed=31)
    ms = [16, 23, 32, 48, 64, 96]
    cfg32 = MatrixProfileConfig(m=16, dtype="float32", band=128, chunk=256,
                                tile_rows=8, tile_cols=128)
    pan = compute_pan_profile(T, ms, config=cfg32, method="fused")
    n = T.shape[0]
    for r, m in enumerate(ms):
        from mpx.reference import compute_matrix_profile_reference

        MPg, MPIg = compute_matrix_profile_reference(T, m)
        wm = n - m + 1
        assert_profile_close(T, m, pan.PMP[r, :wm], pan.PMPI[r, :wm],
                             MPg, MPIg, eps=2e-3)
        assert np.isinf(pan.PMP[r, wm:]).all()


def test_pan_fused_degenerate_windows():
    """Constant stretches (zero variance) stay unmatched at every level."""
    T = random_walk(700, seed=33)
    T[200:340] = 5.0
    ms = [16, 32]
    cfg32 = MatrixProfileConfig(m=16, dtype="float32", band=64, chunk=128,
                                tile_rows=8, tile_cols=64)
    pan = compute_pan_profile(T, ms, config=cfg32, method="fused")
    for r, m in enumerate(ms):
        w = 700 - m + 1
        const_rows = np.array([
            np.ptp(T[i:i + m]) == 0 for i in range(w)
        ])
        matched = pan.PMPI[r, :w][~const_rows]
        # no matched neighbor may BE a degenerate window
        assert not np.isin(matched[matched >= 0],
                           np.nonzero(const_rows)[0]).any()


def test_pan_default_routes_fused():
    """No config -> the fused f32 surface (the exploratory default)."""
    T = random_walk(500, seed=35)
    pan = compute_pan_profile(T, [8, 16])
    assert pan.PMP.shape[0] == 2
    assert np.isfinite(pan.PMP[0][np.asarray(pan.PMPI[0]) >= 0]).all()


def test_pan_fused_multiblock_panels():
    """Window sizes crossing the raw-panel block width (128) exercise
    the multi-block build; levels straddling the boundary must stay
    correct."""
    from tests.helpers import assert_profile_close
    from mpx.reference import compute_matrix_profile_reference

    T = random_walk(1600, seed=71)
    ms = [96, 128, 150, 257]
    cfg32 = MatrixProfileConfig(m=96, dtype="float32", band=128, chunk=256,
                                tile_rows=8, tile_cols=128)
    pan = compute_pan_profile(T, ms, config=cfg32, method="fused")
    for r, m in enumerate(ms):
        MPg, MPIg = compute_matrix_profile_reference(T, m)
        wm = 1600 - m + 1
        assert_profile_close(T, m, pan.PMP[r, :wm], pan.PMPI[r, :wm],
                             MPg, MPIg, eps=2e-3)


def test_pan_motifs_variable_length():
    """A strong motif planted at one length must be found at (about)
    that length, and the second motif must not overlap the first."""
    rng = np.random.default_rng(21)
    T = rng.standard_normal(900)
    # non-periodic pattern: a smooth random walk, so the only strong
    # match is CROSS-occurrence (a periodic pattern would legitimately
    # motif against itself within one occurrence)
    pat = np.cumsum(rng.standard_normal(60))
    pat = (pat - pat.mean()) / pat.std() * 3
    T[100:160] += pat
    T[500:560] += pat
    from mpx.pan import pan_motifs

    cfg = MatrixProfileConfig(m=16, dtype="float64", band=64, chunk=128,
                              tile_rows=8, tile_cols=64)
    pan = compute_pan_profile(T, [16, 32, 56], config=cfg)
    mos = pan_motifs(pan, k=3)
    top = mos[0]
    # the planted pair dominates at SOME length: both occurrences lie
    # inside the planted spans and are phase-aligned (offset 400)
    assert 95 <= top.a and top.a + top.m <= 165
    assert abs((top.b - top.a) - 400) <= 4
    # later motifs never overlap an earlier one's spans (any length)
    spans = [(top.a, top.a + top.m), (top.b, top.b + top.m)]
    for mo in mos[1:]:
        for s in (mo.a, mo.b):
            for lo, hi in spans:
                assert s + mo.m <= lo or s >= hi


def test_pan_discords_variable_length():
    rng = np.random.default_rng(22)
    T = np.sin(np.arange(900) / 7.0) + 0.05 * rng.standard_normal(900)
    T[400:440] += np.linspace(0, 6, 40)  # one anomalous ramp
    from mpx.pan import pan_discords

    cfg = MatrixProfileConfig(m=16, dtype="float64", band=64, chunk=128,
                              tile_rows=8, tile_cols=64)
    pan = compute_pan_profile(T, [16, 32], config=cfg)
    dis = pan_discords(pan, k=2)
    # strongest discord window intersects the planted anomaly
    assert dis[0].a < 440 and dis[0].a + dis[0].m > 400
    # second does not overlap the first
    assert (dis[1].a + dis[1].m <= dis[0].a
            or dis[1].a >= dis[0].a + dis[0].m)


def test_pan_cli_motif_discord_flags(tmp_path, capsys):
    from mpx.io.tsb import write_binary

    rng = np.random.default_rng(23)
    T = rng.standard_normal(600)
    pat = np.sin(np.linspace(0, 3 * np.pi, 40)) * 3
    T[50:90] += pat
    T[300:340] += pat
    inp = str(tmp_path / "t.tsb")
    write_binary(inp, T, "double")
    assert main(["pan", "-i", inp, "--m-lo", "16", "--m-hi", "36",
                 "--count", "3", "--motifs", "1", "--discords", "1",
                 "--method", "exact", "--dtype", "float64"]) == 0
    out = capsys.readouterr().out
    assert "variable-length motifs" in out
    assert "variable-length discords" in out
