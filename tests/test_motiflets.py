"""k-Motiflets: planted-set recovery, elbows, and properties."""

import numpy as np
import pytest

from mpx import MatrixProfileConfig
from mpx.motiflets import (
    Motiflet,
    k_motiflets,
    motiflet_elbows,
    pairwise_extent,
)
from mpx.reference import exclusion_zone


def planted(copies=5, m=48, n=2000, seed=13, jitter=0.02):
    rng = np.random.default_rng(seed)
    T = rng.normal(0, 0.4, n)
    pat = np.sin(np.linspace(0, 3 * np.pi, m))
    gap = n // (copies + 1)
    starts = [gap * (i + 1) for i in range(copies)]
    for s in starts:
        T[s : s + m] += 2.5 * pat + rng.normal(0, jitter, m)
    return T, starts


CFG = dict(dtype="float64", band=64, chunk=128, tile_rows=8, tile_cols=16)


def test_recovers_planted_set():
    T, starts = planted()
    res = k_motiflets(T, k=5, config=MatrixProfileConfig(m=48, **CFG))
    assert res.k == 5 and len(res.indices) == 5
    for idx in res.indices:
        assert min(abs(idx - s) for s in starts) <= 4
    # extent of the found set is small vs random windows
    assert res.extent < 0.25 * np.sqrt(2 * 48)


def test_extent_is_exact_pairwise():
    T, _ = planted()
    res = k_motiflets(T, k=4, config=MatrixProfileConfig(m=48, **CFG))
    assert res.extent == pytest.approx(
        pairwise_extent(np.asarray(T, np.float64), 48, res.indices))


def test_nonoverlap_property():
    T, _ = planted(copies=6)
    m = 48
    zone = max(exclusion_zone(m), m // 2)
    for k in (2, 4, 6):
        res = k_motiflets(T, k=k, config=MatrixProfileConfig(m=m, **CFG))
        d = np.diff(np.sort(res.indices))
        assert (d >= zone).all()


def test_elbow_finds_occurrence_count():
    T, starts = planted(copies=5, jitter=0.01)
    results, elbows = motiflet_elbows(
        T, kmax=8, config=MatrixProfileConfig(m=48, **CFG))
    ks = [r.k for r in results]
    assert ks == list(range(2, 9))
    ext = {r.k: r.extent for r in results}
    # extents are monotone non-decreasing in k (larger sets are harder)
    vals = [ext[k] for k in ks if np.isfinite(ext[k])]
    assert all(a <= b + 1e-9 for a, b in zip(vals, vals[1:]))
    # the strongest elbow is at the planted count
    assert elbows[0] == 5
    assert ext[6] > 2 * ext[5]


def test_overlapping_neighbors_fall_back_to_exact_row():
    # a pure long sinusoid: every window's device top-k list is its own
    # small shifts (all inside the wider motiflet zone), forcing the
    # host MASS fallback, which then finds whole-period repeats
    t = np.arange(3000)
    T = np.sin(2 * np.pi * t / 100) + 1e-4 * np.cos(t)
    res = k_motiflets(T, k=6, m=50,
                      config=MatrixProfileConfig(m=50, **CFG))
    assert len(res.indices) == 6
    assert res.extent < 0.1 * np.sqrt(2 * 50)


def test_validation_errors():
    T, _ = planted()
    with pytest.raises(ValueError, match="k >= 2"):
        k_motiflets(T, k=1, config=MatrixProfileConfig(m=48, **CFG))
    with pytest.raises(ValueError, match="do not fit"):
        k_motiflets(np.random.default_rng(0).normal(0, 1, 200), k=8,
                    config=MatrixProfileConfig(m=48, **CFG))
