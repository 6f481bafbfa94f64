"""Motif/discord extraction on constructed signals."""

import numpy as np

from mpx import MatrixProfileConfig, compute_matrix_profile
from mpx.analysis import top_discords, top_motifs


def test_motifs_and_discords():
    rng = np.random.default_rng(5)
    T = rng.standard_normal(1024) * 0.05
    motif = np.sin(np.linspace(0, 6 * np.pi, 96))
    T[100:196] += motif
    T[700:796] += motif
    T[400:432] += 6.0 * np.hanning(32)  # an anomaly bump
    m = 96
    cfg = MatrixProfileConfig(m=m, dtype="float64", kernel="xla",
                              band=256, chunk=512, tile_rows=8, tile_cols=8)
    MP, MPI = compute_matrix_profile(T, config=cfg)

    motifs = top_motifs(MP, MPI, m, k=1)
    assert motifs, "no motif found"
    a, b, d = motifs[0]
    assert abs(a - 100) <= 4 and abs(b - 700) <= 4
    assert d < 1.0

    discords = top_discords(MP, MPI, m, k=1)
    assert discords
    # the bump at 400 must be among the most anomalous windows
    assert abs(discords[0].index - (400 + 16 - m // 2)) <= m


def test_corrected_arc_curve_and_regimes():
    """Two glued regimes (fast sine vs slow sine): the CAC must dip at
    the boundary and regimes() must locate it within ~2m."""
    import numpy as np

    from mpx import MatrixProfileConfig, compute_matrix_profile
    from mpx.analysis import corrected_arc_curve, regimes

    t = np.arange(3000) / 20.0
    T = np.where(np.arange(3000) < 1500, np.sin(t), np.sin(3.1 * t))
    T = T + np.random.default_rng(5).standard_normal(3000) * 0.02
    m = 50
    cfg = MatrixProfileConfig(m=m, dtype="float32", band=256, chunk=512,
                              tile_rows=8, tile_cols=256)
    MP, MPI = compute_matrix_profile(T, config=cfg)
    MPI = np.asarray(MPI)
    cac = corrected_arc_curve(MPI, m)
    w = MPI.shape[0]
    assert cac.shape == (w,)
    assert (cac <= 1.0 + 1e-12).all()
    found = regimes(MPI, m, k=1)
    assert found, "no regime found"
    assert abs(found[0] - 1500) <= 2 * m, found
    # interior of each regime stays well above the boundary dip
    assert cac[found[0]] < 0.3


def test_arc_curve_no_regime_is_flat():
    import numpy as np

    from mpx import MatrixProfileConfig, compute_matrix_profile
    from mpx.analysis import corrected_arc_curve

    T = np.sin(np.arange(2000) / 15.0)
    m = 40
    cfg = MatrixProfileConfig(m=m, dtype="float32", band=256, chunk=512,
                              tile_rows=8, tile_cols=256)
    MP, MPI = compute_matrix_profile(T, config=cfg)
    cac = corrected_arc_curve(np.asarray(MPI), m)
    # periodic single-regime data: arcs are short (neighboring periods),
    # so the normalized curve sits low but must never report an edge dip
    assert cac[:m].min() >= 1.0 - 1e-12


def test_annotation_vector_guided_profile():
    """A spike-corrupted region would dominate the discords; annotating
    it away must redirect the discord to the genuine anomaly."""
    import numpy as np

    from mpx import MatrixProfileConfig, compute_matrix_profile
    from mpx.analysis import (apply_annotation_vector,
                              complexity_annotation, top_discords)

    rng = np.random.default_rng(8)
    T = np.sin(np.arange(1200) / 10.0) + rng.standard_normal(1200) * 0.05
    T[200:204] += 30.0          # sensor spike (to be annotated away)
    T[800:840] += np.linspace(0, 2.5, 40)  # genuine anomaly
    m = 50
    cfg = MatrixProfileConfig(m=m, dtype="float32", band=128, chunk=256,
                              tile_rows=8, tile_cols=128)
    MP, MPI = compute_matrix_profile(T, config=cfg)
    MP = np.asarray(MP, np.float64)
    d0 = top_discords(MP, np.asarray(MPI), m, k=1)[0]
    assert 150 <= d0.index <= 210   # spike wins without annotation
    AV = np.ones_like(MP)
    AV[max(0, 200 - m):205] = 0.0   # annotate the spike away
    CMP = apply_annotation_vector(MP, AV, mode="discord")
    d1 = top_discords(CMP, np.asarray(MPI), m, k=1)[0]
    assert 750 <= d1.index <= 845, d1
    # motif mode: the annotated windows can never win a motif search
    CM = apply_annotation_vector(MP, AV, mode="motif")
    assert CM[151] > np.nanmax(MP[np.isfinite(MP)]) - 1e-9

    av = complexity_annotation(T, m)
    assert av.shape == MP.shape and av.min() >= 0 and av.max() <= 1


def test_annotation_vector_validation():
    import numpy as np
    import pytest

    from mpx.analysis import apply_annotation_vector

    MP = np.ones(10)
    with pytest.raises(ValueError):
        apply_annotation_vector(MP, np.ones(9))
    with pytest.raises(ValueError):
        apply_annotation_vector(MP, np.full(10, 1.5))


def test_all_chains_partition_and_mutual_links():
    """Chains partition the index set; every link is a mutual
    left/right nearest-neighbor pair."""
    import numpy as np

    from mpx.analysis import all_chains, unanchored_chain
    from mpx.config import MatrixProfileConfig
    from mpx.driver import compute_matrix_profile
    from tests.conftest import random_walk

    n, m = 768, 16
    T = random_walk(n, seed=21)
    cfg = MatrixProfileConfig(m=m, dtype="float64", band=64, chunk=128,
                              tile_rows=8, tile_cols=64, kernel="mxu")
    MPl, MPIl, MPr, MPIr = compute_matrix_profile(
        T, config=cfg, left_right=True
    )
    IL, IR = np.asarray(MPIl), np.asarray(MPIr)
    chains = all_chains(IL, IR)
    w = IR.shape[0]
    flat = np.concatenate([np.asarray(c) for c in chains])
    assert sorted(flat.tolist()) == list(range(w))  # exact partition
    for c in chains:
        for a, b in zip(c, c[1:]):
            assert IR[a] == b and IL[b] == a  # mutual links only
            assert b > a                      # chains move forward
    best = unanchored_chain(IL, IR)
    assert len(best) == max(len(c) for c in chains)


def test_chain_on_drifting_motif():
    """A motif that drifts forward through the series produces a long
    unanchored chain visiting each occurrence in order."""
    import numpy as np

    from mpx.analysis import unanchored_chain
    from mpx.config import MatrixProfileConfig
    from mpx.driver import compute_matrix_profile

    rng = np.random.default_rng(3)
    m = 32
    reps = []
    for k in range(6):
        # same shape, slowly growing amplitude -> chain i -> i+1
        reps.append((1.0 + 0.08 * k) * np.sin(np.linspace(0, 4 * np.pi, 96)))
        reps.append(0.02 * rng.standard_normal(64))
    T = np.concatenate(reps) + 0.005 * rng.standard_normal(
        sum(len(r) for r in reps)
    )
    cfg = MatrixProfileConfig(m=m, dtype="float64", band=128, chunk=256,
                              tile_rows=8, tile_cols=128, kernel="mxu")
    _, MPIl, _, MPIr = compute_matrix_profile(T, config=cfg, left_right=True)
    chain = unanchored_chain(np.asarray(MPIl), np.asarray(MPIr))
    assert len(chain) >= 4  # visits most motif occurrences
    assert (np.diff(chain) > 0).all()


def test_mpdist_properties():
    import numpy as np

    from mpx.analysis import mpdist
    from tests.conftest import random_walk

    m = 16
    A = random_walk(300, seed=5)
    # B shares A's subsequences (a shifted copy) -> tiny MPdist
    B = A[50:250].copy()
    d_shared = mpdist(A, B, m)
    C = random_walk(300, seed=99)
    d_unrelated = mpdist(A, C, m)
    assert d_shared < 0.5 * d_unrelated
    assert d_shared >= 0.0
    # symmetry (ABBA join is symmetric by construction)
    assert abs(mpdist(A, C, m) - mpdist(C, A, m)) < 1e-9


# ---------------------------------------------------------------------------
# mass / match (query similarity search)
# ---------------------------------------------------------------------------


def _brute_mass(Q, T):
    import numpy as np

    m, n = len(Q), len(T)
    w = n - m + 1
    Qz = (Q - Q.mean()) / Q.std()
    out = np.empty(w)
    for j in range(w):
        Wj = T[j:j + m]
        sd = Wj.std()
        if sd < 1e-12:
            out[j] = np.inf
            continue
        Wz = (Wj - Wj.mean()) / sd
        out[j] = np.sqrt(max(((Qz - Wz) ** 2).sum(), 0.0))
    return out


def test_mass_matches_brute_force():
    import numpy as np

    from mpx.analysis import mass

    rng = np.random.default_rng(0)
    T = np.cumsum(rng.standard_normal(500))
    Q = T[100:132].copy()
    for method in ("direct", "fft"):
        D = mass(Q, T, method=method)
        B = _brute_mass(Q, T)
        np.testing.assert_allclose(D, B, atol=1e-7)
        assert D[100] < 1e-6  # the query matches itself exactly


def test_mass_flat_windows_and_flat_query():
    import numpy as np
    import pytest

    from mpx.analysis import mass

    T = np.concatenate([np.ones(50), np.cumsum(np.ones(50) * 0.5 + np.sin(np.arange(50)))])
    D = mass(np.sin(np.arange(16)), T)
    assert np.isinf(D[:20]).all()  # flat region never matches
    with pytest.raises(ValueError, match="zero variance"):
        mass(np.ones(16), T)


def test_match_finds_planted_occurrences():
    import numpy as np

    from mpx.analysis import match

    rng = np.random.default_rng(1)
    pattern = np.sin(np.linspace(0, 4 * np.pi, 64))
    T = rng.standard_normal(1200) * 0.05
    for at in (100, 500, 900):
        T[at:at + 64] += pattern
    got = match(pattern, T, max_distance=2.0)
    assert len(got) == 3
    assert sorted(abs(r.index - at) <= 2 for r, at in
                  zip(sorted(got, key=lambda r: r.index), (100, 500, 900)))
    # nearest-first ordering + max_matches cap
    d = [r.distance for r in got]
    assert d == sorted(d)
    assert len(match(pattern, T, max_distance=2.0, max_matches=2)) == 2


def test_query_cli(tmp_path):
    import numpy as np

    from mpx.cli import main
    from mpx.io.tsb import read_binary, write_binary

    rng = np.random.default_rng(2)
    T = rng.standard_normal(800) * 0.05
    pat = np.sin(np.linspace(0, 6, 48))
    T[200:248] += pat
    T[600:648] += pat
    p = str(tmp_path / "t.tsb")
    write_binary(p, T, "double")
    out = str(tmp_path / "prof")
    # query sliced from the series itself (i:j syntax)
    assert main(["query", "-i", p, "-q", "200:248", "--max-distance", "1.5",
                 "-o", out]) == 0
    D = read_binary(out + ".mpb", "double")
    assert D.shape[0] == 800 - 48 + 1
    assert D[200] < 1e-6 and D[600] < 1.5
