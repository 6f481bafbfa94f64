"""Consensus motifs across multiple series (ostinato).

Beyond reference parity (the reference joins a single series with
itself): given k series, the consensus motif is the subsequence — in
any series — with the smallest *radius*, where

    radius(i, p) = max over j != i of  min_q dist(T_i[p:p+m], T_j[q:q+m])

i.e. the pattern that has a close match in EVERY other series (Ostinato,
ICDM'19).  mpx computes it from the existing MXU AB-join tier: each
unordered series pair contributes both directional profiles in one
sweep (`mpx.abjoin.compute_ab_join`), and the per-window radius is an
elementwise max over the k-1 directional profiles — O(k^2) joins, each
one MXU-shaped, no new kernel code.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np

from mpx.abjoin import compute_ab_join
from mpx.config import MatrixProfileConfig


class ConsensusMotif(NamedTuple):
    series: int      # which series holds the consensus motif
    index: int       # subsequence start within that series
    radius: float    # max distance to its nearest neighbor per other series
    radii: list      # per-series radius profiles (ragged: one array per series)


def ostinato(
    series: Sequence,
    m: Optional[int] = None,
    *,
    config: Optional[MatrixProfileConfig] = None,
) -> ConsensusMotif:
    """Find the consensus motif across ``series`` (two or more 1-D
    arrays, lengths may differ).  Returns the best (series, index,
    radius) plus each series' full radius profile (``radii[i][p]`` =
    radius of window p of series i; inspect it for runner-up motifs).

    Cost note: each of the C(k,2) AB-joins re-stages both operands'
    O(n) statistics; that overhead is dominated by the O(n^2) join
    sweeps themselves, so stats are not cached across pairs.
    """
    if config is None:
        config = MatrixProfileConfig(m=m if m is not None else 32)
    elif m is not None and m != config.m:
        raise ValueError(f"m={m} conflicts with config.m={config.m}")
    m = config.m
    k = len(series)
    if k < 2:
        raise ValueError("ostinato needs at least two series")
    series = [np.asarray(s) for s in series]

    radii = [np.zeros(s.shape[0] - m + 1, np.float64) for s in series]
    for i in range(k):
        for j in range(i + 1, k):
            res = compute_ab_join(series[i], series[j], config=config)
            np.maximum(radii[i], np.asarray(res.mp_a, np.float64),
                       out=radii[i])
            np.maximum(radii[j], np.asarray(res.mp_b, np.float64),
                       out=radii[j])

    best = (np.inf, -1, -1)
    for i, r in enumerate(radii):
        fin = np.isfinite(r)
        if not fin.any():
            continue
        p = int(np.where(fin, r, np.inf).argmin())
        if r[p] < best[0]:
            best = (float(r[p]), i, p)
    if best[1] < 0:
        raise ValueError("no finite radius — every window is degenerate")
    return ConsensusMotif(series=best[1], index=best[2], radius=best[0],
                          radii=radii)
