"""Time-series snippets: the k most representative segments.

Motifs answer "what repeats exactly?"; snippets answer "what does this
series TYPICALLY look like?" (Imani et al., Matrix Profile XIII).  A
snippet is an L-length segment chosen so that, collectively, the k
snippets are the nearest representative of as much of the series as
possible.

Method (the standard formulation):

1. candidates = the floor(n/L) non-overlapping L-segments;
2. for each candidate, its *min distance profile* D_j[t] =
   distance from T[t : t+m] to the nearest m-subsequence of the
   candidate — exactly the B->A direction of one AB-join, so each
   candidate costs one MXU sweep (mpx.abjoin.compute_ab_join);
3. greedy cover: repeatedly pick the candidate whose inclusion most
   reduces the area under the pointwise-min profile;
4. every position is assigned to its nearest chosen snippet; a
   snippet's ``fraction`` is the share of positions it represents.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import numpy as np

from mpx.config import MatrixProfileConfig


class Snippet(NamedTuple):
    start: int        # segment start in T
    length: int       # = L
    fraction: float   # share of the series it represents
    index: int        # candidate ordinal (start // L)


def snippets(
    T,
    L: int,
    k: int = 2,
    m: Optional[int] = None,
    config: Optional[MatrixProfileConfig] = None,
) -> List[Snippet]:
    """The ``k`` most representative L-length segments of ``T``.

    ``m`` is the comparison subsequence length (default L // 2, the
    paper's recommendation).  ``config`` carries dtype/kernel knobs for
    the underlying AB-joins; its ``m`` is ignored."""
    from dataclasses import replace

    from mpx.abjoin import compute_ab_join

    T = np.asarray(T, np.float64)
    n = T.shape[0]
    if m is None:
        m = max(4, L // 2)
    if L < m:
        raise ValueError(f"snippet length L={L} must be >= m={m}")
    ncand = n // L
    if ncand < 1:
        raise ValueError(f"series of length {n} has no L={L} segment")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    k = min(k, ncand)
    if config is None:
        config = MatrixProfileConfig(m=m)
    else:
        config = replace(config, m=m)

    # Min distance profile of every candidate (one AB-join each; mp_b is
    # the distance of each T-subsequence to its nearest candidate
    # subsequence).
    D = np.empty((ncand, n - m + 1), np.float64)
    for j in range(ncand):
        cand = T[j * L : (j + 1) * L]
        res = compute_ab_join(cand, T, config=config)
        D[j] = np.asarray(res.mp_b, np.float64)

    # Greedy minimum-area cover.
    chosen: List[int] = []
    best = np.full(n - m + 1, np.inf)
    for _ in range(k):
        areas = [
            np.minimum(best, D[j]).sum() if j not in chosen else np.inf
            for j in range(ncand)
        ]
        pick = int(np.argmin(areas))
        if not np.isfinite(areas[pick]):
            break
        chosen.append(pick)
        best = np.minimum(best, D[pick])

    # Coverage fractions by nearest-snippet assignment.
    sel = D[chosen]  # (k, n-m+1)
    assign = np.argmin(sel, axis=0)
    out = []
    for rank, j in enumerate(chosen):
        frac = float(np.mean(assign == rank))
        out.append(Snippet(start=j * L, length=L, fraction=frac, index=j))
    return out
