"""Contrast profile: patterns present in one series and absent in another.

Given a "positive" series ``T+`` (contains the behavior of interest) and a
"negative" series ``T-`` (does not), the contrast profile is

    CP(i) = clip(MP_AB(i) - MP_AA(i), 0) / sqrt(2 m)        (clipped to [0, 1])

where ``MP_AA`` is the self-join profile of ``T+`` (distance to the nearest
*other* subsequence of ``T+``) and ``MP_AB`` is the AB-join profile of ``T+``
against ``T-`` (distance to the nearest subsequence of ``T-``).  A high
``CP(i)`` means the subsequence at ``i`` repeats within ``T+`` (small
``MP_AA``) while nothing similar exists in ``T-`` (large ``MP_AB``) — i.e. it
is a *class-distinguishing* pattern ("platonic motif" in the contrast-profile
literature).

The reference implements only the self-join engine
(kernel/MatrixProfileKernelStreamless.cpp); mpx composes its self-join and
AB-join tiers (both MXU-backed, both with exact-f64 hybrid routing), so the
contrast profile inherits every precision/kernel option of
:func:`mpx.compute_matrix_profile` for free.

sqrt(2m) normalization: z-normalized Euclidean distance satisfies
``d = sqrt(2 m (1 - r))`` with Pearson ``r`` in [-1, 1], so ``d <= 2 sqrt(m)``
and the difference of two profiles lies in ``[-2 sqrt(m), 2 sqrt(m)]``;
dividing by ``sqrt(2 m)`` puts the *positively correlated* regime in [0, 1]
(anti-correlated AB-matches can exceed 1 and are clipped, as in the paper's
formulation).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from mpx.abjoin import compute_ab_join
from mpx.config import MatrixProfileConfig
from mpx.driver import compute_matrix_profile
from mpx.reference import exclusion_zone


class ContrastResult(NamedTuple):
    cp: np.ndarray      # (w+,) contrast profile in [0, 1]
    mp_aa: np.ndarray   # (w+,) T+ self-join profile
    mp_ab: np.ndarray   # (w+,) T+ -> T- AB-join profile
    mpi_aa: np.ndarray  # (w+,) self-join nearest-neighbor index (into T+)
    mpi_ab: np.ndarray  # (w+,) AB-join nearest-neighbor index (into T-)


class ContrastMotif(NamedTuple):
    index: int        # position in T+
    neighbor: int     # its nearest in-class neighbor (position in T+)
    score: float      # CP value in [0, 1]


def _contrast_from_profiles(mp_aa, mp_ab, mpi_aa, mpi_ab, m: int) -> np.ndarray:
    mp_aa = np.asarray(mp_aa, dtype=np.float64)
    mp_ab = np.asarray(mp_ab, dtype=np.float64)
    cp = np.clip((mp_ab - mp_aa) / np.sqrt(2.0 * m), 0.0, 1.0)
    # untouched/flat entries carry the sqrt(2m(1+1e12)) sentinel and
    # MPI_INIT=-1 indices.  The in-class side gates everything: without
    # a real T+ neighbor there is no motif to contrast (CP = 0).  A
    # missing T- neighbor means the pattern has NO comparable content in
    # the minus class at all — maximally contrastive, CP = 1 (the limit
    # of the formula as d_ab -> its sqrt(4m) ceiling and beyond).
    valid_aa = (np.asarray(mpi_aa) >= 0) & np.isfinite(mp_aa)
    valid_ab = (np.asarray(mpi_ab) >= 0) & np.isfinite(mp_ab)
    cp = np.where(valid_ab, cp, 1.0)
    return np.where(valid_aa, cp, 0.0)


def contrast_profile(
    T_plus,
    T_minus,
    m: Optional[int] = None,
    config: Optional[MatrixProfileConfig] = None,
    *,
    profile=None,
) -> ContrastResult:
    """Contrast profile of ``T_plus`` against ``T_minus`` at window ``m``.

    ``config`` routes both underlying joins (dtype/kernel/band/chunk), so
    e.g. ``dtype='float64'`` gives an exact-double contrast profile via the
    hybrid tier.  ``profile`` optionally records per-phase timings.
    """
    if config is None:
        config = MatrixProfileConfig(m=m if m is not None else 32)
    elif m is not None and m != config.m:
        raise ValueError(f"m={m} conflicts with config.m={config.m}")
    m = config.m

    mp_aa, mpi_aa = compute_matrix_profile(T_plus, config=config,
                                           profile=profile)
    ab = compute_ab_join(T_plus, T_minus, config=config, profile=profile)
    mp_aa = np.asarray(mp_aa)
    mpi_aa = np.asarray(mpi_aa)
    mp_ab = np.asarray(ab.mp_a)
    mpi_ab = np.asarray(ab.mpi_a)
    cp = _contrast_from_profiles(mp_aa, mp_ab, mpi_aa, mpi_ab, m)
    return ContrastResult(cp=cp, mp_aa=mp_aa, mp_ab=mp_ab,
                          mpi_aa=mpi_aa, mpi_ab=mpi_ab)


def top_contrast_motifs(
    result: ContrastResult, m: int, k: int = 3
) -> List[ContrastMotif]:
    """k highest-CP motifs, each suppressing an m/2 trivial-match zone.

    Both the peak and its in-class neighbor are suppressed (the neighbor is,
    by construction, (nearly) the same pattern).
    """
    cp = result.cp.copy()
    zone = max(exclusion_zone(m), m // 2)
    alive = cp > 0.0
    out: List[ContrastMotif] = []
    while len(out) < k and alive.any():
        i = int(np.where(alive, cp, -np.inf).argmax())
        if cp[i] <= 0.0:
            break
        j = int(result.mpi_aa[i])
        out.append(ContrastMotif(index=i, neighbor=j, score=float(cp[i])))
        lo = max(0, i - zone)
        alive[lo : i + zone + 1] = False
        if j >= 0:
            lo = max(0, j - zone)
            alive[lo : j + zone + 1] = False
    return out


def pan_contrast_profile(
    T_plus,
    T_minus,
    ms: Sequence[int],
    config: Optional[MatrixProfileConfig] = None,
) -> List[Tuple[int, np.ndarray]]:
    """Contrast profile at each window in ``ms`` (the pan contrast profile).

    Returns ``[(m, cp_m)]``; all CPs share the [0, 1] normalization so the
    global peak across rows identifies the best (m, i) contrast pattern —
    see :func:`best_contrast`.
    """
    from dataclasses import replace

    out: List[Tuple[int, np.ndarray]] = []
    for m in sorted(set(int(m) for m in ms)):
        # carry the FULL config (input_quant, tiles, dispatch_group, ...)
        # so pan rows match single-m runs of the same config exactly
        cfg = (MatrixProfileConfig(m=m) if config is None
               else replace(config, m=m))
        out.append((m, contrast_profile(T_plus, T_minus, config=cfg).cp))
    return out


def best_contrast(pan: List[Tuple[int, np.ndarray]]) -> Tuple[int, int, float]:
    """(m, index, score) of the global peak of a pan contrast profile."""
    best = (0, 0, -1.0)
    for m, cp in pan:
        if cp.size == 0:
            continue
        i = int(cp.argmax())
        if float(cp[i]) > best[2]:
            best = (m, i, float(cp[i]))
    return best


def brute_force_contrast_profile(T_plus, T_minus, m: int) -> np.ndarray:
    """O(n^2) float64 oracle, from the brute-force join oracles."""
    from mpx.abjoin import brute_force_ab_join
    from mpx.reference import brute_force_matrix_profile

    mp_aa, mpi_aa = brute_force_matrix_profile(np.asarray(T_plus, np.float64), m)
    mp_ab, mpi_ab, _, _ = brute_force_ab_join(
        np.asarray(T_plus, np.float64), np.asarray(T_minus, np.float64), m
    )
    return _contrast_from_profiles(mp_aa, mp_ab, mpi_aa, mpi_ab, m)
