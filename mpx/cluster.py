"""Multi-series clustering under MPdist.

Beyond reference parity (the reference computes one self-join profile —
host/MatrixProfileHost.cpp:54-160; it has no multi-series tooling): the
MPdist paper's headline application is comparing and CLUSTERING whole
time series by shared-subsequence structure, robust to misalignment,
warping-free.  mpx composes it from existing tiers:

* the k x k distance matrix comes from C(k,2) MXU AB-joins — each
  unordered pair yields BOTH directional profiles in one sweep
  (`mpx.abjoin.compute_ab_join`), exactly the ostinato access pattern —
  reduced to scalars by `mpx.analysis.mpdist_from_profiles`;
* hierarchical agglomerative clustering (single / complete / average
  linkage) runs on the host over the tiny k x k matrix — a Lance-
  Williams update in O(k^3) numpy, negligible next to the O(n^2) joins;
* each cluster reports its MEDOID (the member minimizing the sum of
  within-cluster distances), the natural exemplar under a non-metric
  distance like MPdist.

The device does all O(n^2) work; nothing here adds kernel code.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import numpy as np

from mpx.config import MatrixProfileConfig


def mpdist_matrix(
    series: Sequence,
    m: Optional[int] = None,
    *,
    threshold: float = 0.05,
    config: Optional[MatrixProfileConfig] = None,
) -> np.ndarray:
    """Symmetric k x k MPdist matrix over ``series`` (two or more 1-D
    arrays, lengths may differ).  One AB-join per unordered pair; the
    diagonal is 0 by definition."""
    if config is None:
        config = MatrixProfileConfig(m=m if m is not None else 32)
    elif m is not None and m != config.m:
        raise ValueError(f"m={m} conflicts with config.m={config.m}")
    from mpx.analysis import mpdist

    k = len(series)
    if k < 2:
        raise ValueError("mpdist_matrix needs at least two series")
    series = [np.asarray(s) for s in series]
    D = np.zeros((k, k), np.float64)
    for i in range(k):
        for j in range(i + 1, k):
            D[i, j] = D[j, i] = mpdist(
                series[i], series[j], config.m,
                threshold=threshold, config=config,
            )
    return D


# Lance-Williams coefficients: new = a1*d(x,i) + a2*d(x,j) + b*d(i,j)
# as functions of the merged cluster sizes (ni, nj).
_LINKAGES = ("single", "complete", "average")


def hierarchical_cluster(
    D: np.ndarray,
    n_clusters: int,
    *,
    linkage: str = "average",
) -> np.ndarray:
    """Agglomerative clustering of a precomputed distance matrix down to
    ``n_clusters`` groups.  Returns integer labels in [0, n_clusters),
    numbered by first member occurrence.  Deterministic: ties merge the
    lexicographically smallest (i, j) pair."""
    if linkage not in _LINKAGES:
        raise ValueError(f"linkage must be one of {_LINKAGES}")
    D = np.asarray(D, np.float64)
    k = D.shape[0]
    if D.shape != (k, k):
        raise ValueError("D must be square")
    if not (1 <= n_clusters <= k):
        raise ValueError(f"n_clusters must be in [1, {k}]")
    if not np.allclose(D, D.T, equal_nan=True):
        raise ValueError("D must be symmetric")

    # working copy with inf diagonal; alive[i] marks active clusters
    W = D.copy()
    np.fill_diagonal(W, np.inf)
    alive = np.ones(k, bool)
    size = np.ones(k, np.int64)
    member = [[i] for i in range(k)]
    for _ in range(k - n_clusters):
        # smallest distance among alive pairs; argmin over the flat
        # matrix gives the lexicographically smallest tie
        M = np.where(alive[:, None] & alive[None, :], W, np.inf)
        flat = int(M.argmin())
        i, j = sorted(divmod(flat, k))
        if not np.isfinite(M[i, j]):
            raise ValueError("distance matrix has no finite merge left")
        # Lance-Williams update of row i (the surviving cluster)
        if linkage == "single":
            new = np.minimum(W[i], W[j])
        elif linkage == "complete":
            new = np.maximum(W[i], W[j])
        else:  # average (UPGMA)
            new = (size[i] * W[i] + size[j] * W[j]) / (size[i] + size[j])
        W[i], W[:, i] = new, new
        W[i, i] = np.inf
        alive[j] = False
        size[i] += size[j]
        member[i].extend(member[j])

    # label clusters by their smallest member for determinism
    labels = np.empty(k, np.int64)
    next_label = 0
    for i in sorted((i for i in range(k) if alive[i]),
                    key=lambda i: min(member[i])):
        labels[member[i]] = next_label
        next_label += 1
    return labels


class Cluster(NamedTuple):
    label: int
    members: List[int]
    medoid: int         # member minimizing the within-cluster distance sum
    radius: float       # max distance from the medoid to a member


class ClusterResult(NamedTuple):
    labels: np.ndarray          # per-series cluster label
    clusters: List[Cluster]
    distances: np.ndarray       # the k x k MPdist matrix


def summarize_clusters(D: np.ndarray, labels: np.ndarray) -> List[Cluster]:
    """Per-cluster medoid + radius from a distance matrix and labels."""
    D = np.asarray(D, np.float64)
    labels = np.asarray(labels)
    out: List[Cluster] = []
    for lbl in np.unique(labels):
        idx = np.nonzero(labels == lbl)[0]
        sub = D[np.ix_(idx, idx)]
        med = int(idx[sub.sum(axis=1).argmin()])
        radius = float(D[med, idx].max())
        out.append(Cluster(int(lbl), idx.tolist(), med, radius))
    return out


def cluster_series(
    series: Sequence,
    m: Optional[int] = None,
    *,
    n_clusters: int = 2,
    linkage: str = "average",
    threshold: float = 0.05,
    config: Optional[MatrixProfileConfig] = None,
) -> ClusterResult:
    """End-to-end: MPdist matrix over ``series`` (device AB-joins) ->
    hierarchical clustering (host) -> per-cluster medoids."""
    D = mpdist_matrix(series, m, threshold=threshold, config=config)
    labels = hierarchical_cluster(D, n_clusters, linkage=linkage)
    return ClusterResult(labels, summarize_clusters(D, labels), D)
