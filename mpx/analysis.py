"""Matrix-profile analysis helpers: motifs and discords.

The reference computes the raw profile only; its dataset catalog ships a
motifs-discords set (data/synthetic/motifs-discords-small.txt) for
downstream analysis.  mpx includes the standard extraction algorithms so
the profile is directly actionable:

* motifs   — lowest-distance mutually-nearest pairs, with an exclusion
  zone around each reported motif to suppress trivial variants;
* discords — highest-distance subsequences (most anomalous), same
  exclusion rule.
"""

from __future__ import annotations

from typing import List, NamedTuple

import numpy as np

from mpx.reference import exclusion_zone


class Motif(NamedTuple):
    a: int
    b: int
    distance: float


class Discord(NamedTuple):
    index: int
    distance: float


def _suppress(mask: np.ndarray, center: int, zone: int):
    lo = max(0, center - zone)
    mask[lo : center + zone + 1] = False


def top_motifs(MP, MPI, m: int, k: int = 3) -> List[Motif]:
    """k lowest-distance motif pairs, each suppressing an m/2 zone."""
    MP = np.asarray(MP, dtype=np.float64).copy()
    MPI = np.asarray(MPI)
    zone = max(exclusion_zone(m), m // 2)
    alive = np.isfinite(MP) & (MPI >= 0)
    out: List[Motif] = []
    while len(out) < k and alive.any():
        i = int(np.where(alive, MP, np.inf).argmin())
        if not np.isfinite(MP[i]):
            break
        j = int(MPI[i])
        out.append(Motif(min(i, j), max(i, j), float(MP[i])))
        _suppress(alive, i, zone)
        _suppress(alive, j, zone)
    return out


def top_discords(MP, MPI, m: int, k: int = 3) -> List[Discord]:
    """k highest-distance subsequences (anomalies)."""
    MP = np.asarray(MP, dtype=np.float64)
    MPI = np.asarray(MPI)
    zone = max(exclusion_zone(m), m // 2)
    alive = np.isfinite(MP) & (MPI >= 0)
    out: List[Discord] = []
    while len(out) < k and alive.any():
        i = int(np.where(alive, MP, -np.inf).argmax())
        if not alive[i]:
            break
        out.append(Discord(i, float(MP[i])))
        _suppress(alive, i, zone)
    return out
