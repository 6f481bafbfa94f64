"""Snippets (mpx/snippets.py): representative segments via per-candidate
AB-join min distance profiles + greedy cover."""

import numpy as np
import pytest

from mpx.config import MatrixProfileConfig
from mpx.snippets import snippets


def _two_regime_series(n_half=512, period=32, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n_half)
    sine = np.sin(2 * np.pi * t / period)
    square = np.sign(np.sin(2 * np.pi * t / period))
    T = np.concatenate([sine, square]) + 0.05 * rng.standard_normal(2 * n_half)
    return T


def test_snippets_find_both_regimes():
    T = _two_regime_series()
    cfg = MatrixProfileConfig(m=32, band=64, chunk=256,
                              tile_rows=8, tile_cols=64)
    out = snippets(T, L=64, k=2, config=cfg)
    assert len(out) == 2
    starts = sorted(s.start for s in out)
    assert starts[0] < 512 <= starts[1]       # one snippet per regime
    fr = {s.start: s.fraction for s in out}
    assert abs(sum(fr.values()) - 1.0) < 1e-9
    assert all(0.3 < f < 0.7 for f in fr.values())  # ~50/50 coverage


def test_snippets_single_regime_fraction_one():
    T = _two_regime_series()[:512]
    cfg = MatrixProfileConfig(m=32, band=64, chunk=256,
                              tile_rows=8, tile_cols=64)
    out = snippets(T, L=64, k=1, config=cfg)
    assert len(out) == 1 and out[0].fraction == 1.0
    assert out[0].length == 64 and out[0].start == out[0].index * 64


def test_snippets_validation():
    with pytest.raises(ValueError):
        snippets(np.zeros(100) + np.arange(100), L=200)
    with pytest.raises(ValueError):
        snippets(np.arange(100, dtype=float), L=8, m=16)


def test_snippets_cli(tmp_path, capsys):
    from mpx.cli import main
    from mpx.io.tsb import write_binary

    T = _two_regime_series(n_half=256, seed=4)
    write_binary(str(tmp_path / "s.tsb"), T, "double")
    assert main([
        "snippets", "-i", str(tmp_path / "s.tsb"), "-L", "64", "-k", "2",
    ]) == 0
    out = capsys.readouterr().out
    assert "snippets" in out and len(out.strip().splitlines()) == 3
