"""MPdist clustering: matrix properties, linkage correctness vs scipy,
family recovery end-to-end, CLI."""

import numpy as np
import pytest

from mpx.cluster import (
    cluster_series,
    hierarchical_cluster,
    mpdist_matrix,
    summarize_clusters,
)
from tests.conftest import random_walk


def family_series(kind, n, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    if kind == "sine":
        base = np.sin(2 * np.pi * t / 37.0)
    elif kind == "square":
        base = np.sign(np.sin(2 * np.pi * t / 53.0)) * 0.9
    else:  # walk
        base = np.cumsum(rng.standard_normal(n)) * 0.1
    return base + 0.05 * rng.standard_normal(n)


def test_mpdist_matrix_properties():
    series = [family_series("sine", 400, s) for s in (1, 2)] + [
        family_series("walk", 380, 3)
    ]
    D = mpdist_matrix(series, m=32, config=None)
    assert D.shape == (3, 3)
    assert np.allclose(D, D.T)
    assert (np.diag(D) == 0).all()
    assert (D[np.triu_indices(3, 1)] > 0).all()
    # same-family pair is closer than cross-family pairs
    assert D[0, 1] < D[0, 2] and D[0, 1] < D[1, 2]


@pytest.mark.parametrize("linkage", ["single", "complete", "average"])
def test_hierarchical_matches_scipy(linkage):
    scipy_hier = pytest.importorskip("scipy.cluster.hierarchy")
    squareform = pytest.importorskip("scipy.spatial.distance").squareform
    rng = np.random.default_rng(5)
    for trial in range(5):
        k = int(rng.integers(4, 12))
        X = rng.random((k, 3))
        D = np.sqrt(((X[:, None] - X[None, :]) ** 2).sum(-1))
        for n_clusters in (1, 2, 3, k):
            ours = hierarchical_cluster(D, n_clusters, linkage=linkage)
            Z = scipy_hier.linkage(squareform(D), method=linkage)
            ref = scipy_hier.fcluster(Z, n_clusters, criterion="maxclust")
            # same partition up to label permutation
            assert len(set(zip(ours.tolist(), ref.tolist()))) == \
                len(set(ours.tolist())) == len(set(ref.tolist()))


def test_hierarchical_validation():
    D = np.array([[0.0, 1.0], [1.0, 0.0]])
    with pytest.raises(ValueError, match="linkage"):
        hierarchical_cluster(D, 1, linkage="ward")
    with pytest.raises(ValueError, match="n_clusters"):
        hierarchical_cluster(D, 3)
    with pytest.raises(ValueError, match="symmetric"):
        hierarchical_cluster(np.array([[0.0, 1.0], [2.0, 0.0]]), 1)


def test_summarize_clusters_medoid():
    # 0 and 1 close together, 2 far: medoid of {0,1,2} under one label
    D = np.array([
        [0.0, 1.0, 4.0],
        [1.0, 0.0, 5.0],
        [4.0, 5.0, 0.0],
    ])
    (c,) = summarize_clusters(D, np.zeros(3, int))
    assert c.medoid == 0 and c.radius == 4.0 and c.members == [0, 1, 2]


def test_cluster_series_recovers_families():
    series = (
        [family_series("sine", 400, s) for s in (11, 12, 13)]
        + [family_series("square", 420, s) for s in (14, 15)]
    )
    res = cluster_series(series, m=32, n_clusters=2)
    labels = res.labels
    assert set(labels[:3]) != set(labels[3:])
    assert len(set(labels[:3].tolist())) == 1
    assert len(set(labels[3:].tolist())) == 1
    # medoids belong to their own clusters
    for c in res.clusters:
        assert c.medoid in c.members
        assert labels[c.medoid] == c.label


def test_cluster_cli(tmp_path, capsys):
    from mpx.cli import main
    from mpx.io.tsb import write_binary

    paths = []
    for i, kind in enumerate(["sine", "sine", "walk"]):
        p = str(tmp_path / f"s{i}.tsb")
        write_binary(p, family_series(kind, 350, 20 + i), "double")
        paths.append(p)
    argv = ["cluster", "-m", "24", "-k", "2"]
    for p in paths:
        argv += ["-i", p]
    assert main(argv) == 0
    out = capsys.readouterr().out
    assert "MPdist matrix (3x3" in out
    assert out.count("cluster ") == 2
    # the two sines share a cluster, the walk is alone
    lines = [ln for ln in out.splitlines() if ln.startswith("cluster")]
    solo = [ln for ln in lines if ln.count(".tsb") == 2]  # medoid + 1 member
    assert any("s2.tsb" in ln for ln in solo)
