"""Consensus motifs (ostinato) vs a brute-force oracle."""

import numpy as np
import pytest

from mpx.config import MatrixProfileConfig
from mpx.ostinato import ostinato


def znorm(x):
    c = x - x.mean()
    return c / np.sqrt((c * c).sum())


def ostinato_oracle(series, m):
    """O(k^2 n^2 m) reference."""
    k = len(series)
    U = []
    for s in series:
        w = s.shape[0] - m + 1
        U.append(np.stack([znorm(s[p : p + m].astype(np.float64))
                           for p in range(w)]))
    best = (np.inf, -1, -1)
    radii = []
    for i in range(k):
        wi = U[i].shape[0]
        r = np.zeros(wi)
        for p in range(wi):
            worst = 0.0
            for j in range(k):
                if j == i:
                    continue
                d = np.sqrt(np.maximum(
                    2.0 * m * (1.0 - U[j] @ U[i][p]), 0.0)).min()
                worst = max(worst, d)
            r[p] = worst
            if worst < best[0]:
                best = (worst, i, p)
        radii.append(r)
    return best, radii


# f64 tolerance is 1e-7 (not the 1e-8 framework contract): the planted
# pattern has TRUE distance 0, where sqrt(2m(1-p)) amplifies a single
# f64 ulp of correlation rounding (p = 1 - 2^-53) to sqrt(2m*eps) ~
# 6e-8 in distance — the sqrt derivative is singular at d=0, in any
# correlation-based formulation (the reference shares the hazard).
@pytest.mark.parametrize("dtype,tol", [("float32", 2e-3), ("float64", 1e-7)])
def test_ostinato_matches_oracle(dtype, tol):
    rng = np.random.default_rng(89)
    m = 16
    series = [np.cumsum(rng.standard_normal(n)) for n in (180, 140, 210)]
    # plant a shared pattern in all three
    pat = np.cumsum(rng.standard_normal(m))
    for s, at in zip(series, (40, 90, 160)):
        s[at : at + m] = pat + s[at]
    cfg = MatrixProfileConfig(m=m, dtype=dtype, band=32, chunk=64)
    got = ostinato(series, config=cfg)
    (bR, bi, bp), radii = ostinato_oracle(series, m)
    for r_got, r_exp in zip(got.radii, radii):
        np.testing.assert_allclose(r_got, r_exp, atol=tol)
    assert abs(got.radius - bR) <= tol
    # the winner must be radius-equivalent to the oracle's (ties allowed)
    assert abs(got.radii[got.series][got.index] - bR) <= tol
    assert got.radius <= bR + tol


def test_ostinato_validation():
    rng = np.random.default_rng(97)
    with pytest.raises(ValueError, match="two series"):
        ostinato([rng.standard_normal(100)], m=8)


def test_cli_ostinato(tmp_path, capsys):
    from mpx.cli import main
    from mpx.io.tsb import write_binary

    rng = np.random.default_rng(101)
    m = 16
    paths = []
    pat = np.cumsum(rng.standard_normal(m))
    for t, (n, at) in enumerate([(160, 30), (150, 80)]):
        s = np.cumsum(rng.standard_normal(n))
        s[at : at + m] = pat + s[at]
        p = str(tmp_path / f"s{t}.tsb")
        write_binary(p, s, "double")
        paths.append(p)
    rc = main(["ostinato", "-i", paths[0], "-i", paths[1], "-m", str(m)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "consensus motif" in out and "radius" in out
