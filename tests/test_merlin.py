"""Exact multi-length discords (merlin tier) vs the golden oracle."""

import numpy as np
import pytest

from mpx.merlin import (
    brute_force_multi_length_discords,
    multi_length_discords,
)


def _walk(n, seed):
    return np.cumsum(np.random.default_rng(seed).standard_normal(n))


def test_every_length_exact():
    T = _walk(800, 11)
    T[400:416] += np.linspace(0, 9, 16)
    res = multi_length_discords(T, 8, 40)
    exp = brute_force_multi_length_discords(T, range(8, 41))
    assert [d.m for d in res.per_length] == [d.m for d in exp]
    for got, want in zip(res.per_length, exp):
        assert got.distance == pytest.approx(want.distance, abs=1e-9)
        # index ties only for equidistant discords
        if got.index != want.index:
            assert got.distance == pytest.approx(want.distance, abs=1e-9)


def test_explicit_ms_and_planted_anomaly():
    rng = np.random.default_rng(12)
    # periodic base so the planted glitch dominates every length
    t = np.arange(1200)
    T = np.sin(2 * np.pi * t / 50) + 0.05 * rng.standard_normal(1200)
    T[600:625] = T[600:625][::-1] + 1.5
    res = multi_length_discords(T, ms=[16, 25, 40], k=2)
    assert [d.m for d in res.per_length] == [16, 25, 40]
    top = res.top[0]
    assert 560 <= top.index <= 630  # the glitch wins at some length
    # top list is overlap-suppressed
    for a, b in zip(res.top, res.top[1:]):
        assert not (a.index < b.index + b.m and b.index < a.index + a.m)


def test_top_scores_are_normalized_and_sorted():
    T = _walk(600, 13)
    res = multi_length_discords(T, 8, 24, k=4)
    scores = [d.score for d in res.top]
    assert scores == sorted(scores, reverse=True)
    for d in res.per_length:
        assert d.score == pytest.approx(d.distance / (2 * np.sqrt(d.m)))


def test_validation_errors():
    T = _walk(100, 14)
    with pytest.raises(ValueError):
        multi_length_discords(T)  # no range
    with pytest.raises(ValueError):
        multi_length_discords(T, 2, 10)  # m < 4
    with pytest.raises(ValueError):
        multi_length_discords(T, 20, 10)  # empty range
    with pytest.raises(ValueError):
        multi_length_discords(T, 8, 16, k=0)


def test_multi_length_motifs_exact():
    from mpx.merlin import (
        brute_force_multi_length_motifs,
        multi_length_motifs,
    )

    rng = np.random.default_rng(31)
    # noise base (NOT a walk): the planted pair must dominate its length
    T = 0.05 * rng.standard_normal(800)
    pat = np.sin(np.linspace(0, 3 * np.pi, 40)) * 3
    T[100:140] += pat
    T[500:540] += pat
    res = multi_length_motifs(T, 8, 40, k=2)
    exp = brute_force_multi_length_motifs(T, range(8, 41))
    assert [d.m for d in res.per_length] == [d.m for d in exp]
    for got, want in zip(res.per_length, exp):
        assert got.distance == pytest.approx(want.distance, abs=1e-9)
    # at the planted length the motif is the planted pair (any common
    # shift inside the two regions is equally valid — the copies are
    # identical up to noise at every offset)
    at40 = [d for d in res.per_length if d.m == 40][0]
    a, b = sorted((at40.index, at40.nn_index))
    assert abs(b - a - 400) <= 4 and 85 <= a <= 115
    # exactness also holds on a random walk (no planted structure)
    W = _walk(600, 32)
    resw = multi_length_motifs(W, ms=[8, 16, 24])
    expw = brute_force_multi_length_motifs(W, [8, 16, 24])
    for got, want in zip(resw.per_length, expw):
        assert got.distance == pytest.approx(want.distance, abs=1e-9)
    # top list: ascending score, both spans suppressed
    scores = [d.score for d in res.top]
    assert scores == sorted(scores)
    spans = []
    for d in res.top:
        spans.append((d.index, d.index + d.m))
        spans.append((d.nn_index, d.nn_index + d.m))
    for x in range(len(spans)):
        for y in range(x + 1, len(spans)):
            a, b = spans[x], spans[y]
            assert not (a[0] < b[1] and b[0] < a[1])


def test_candidate_cap_overflow_escalates_exactly(monkeypatch):
    """Repetitive input -> a near-flat profile -> the candidate band
    overflows the cap.  The default path (escalate=True) re-sweeps
    those lengths as full exact profiles: the result must STILL match
    brute force, with the lengths reported in escalated_lengths and
    exact=True (round-3 review item 6: the degraded path was untested
    and invisible)."""
    import mpx.merlin as merlin_mod

    monkeypatch.setattr(merlin_mod, "_MAX_CANDIDATES", 8)
    rng = np.random.default_rng(44)
    t = np.arange(700)
    # strongly periodic -> thousands of near-tied rows per length
    T = np.sin(2 * np.pi * t / 40) + 1e-3 * rng.standard_normal(700)
    res = multi_length_discords(T, ms=[16, 24])
    assert res.escalated_lengths, "overflow must trigger escalation"
    assert res.exact and not res.truncated_lengths
    exp = brute_force_multi_length_discords(T, [16, 24])
    assert [d.m for d in res.per_length] == [d.m for d in exp]
    for got, want in zip(res.per_length, exp):
        assert got.distance == pytest.approx(want.distance, abs=1e-9)


def test_candidate_cap_overflow_truncation_is_visible(monkeypatch):
    """escalate=False restores the cheap truncation path — but the
    result object must say so (exact=False, truncated_lengths)."""
    import mpx.merlin as merlin_mod

    monkeypatch.setattr(merlin_mod, "_MAX_CANDIDATES", 8)
    rng = np.random.default_rng(45)
    t = np.arange(700)
    T = np.sin(2 * np.pi * t / 40) + 1e-3 * rng.standard_normal(700)
    res = multi_length_discords(T, ms=[16, 24], escalate=False)
    assert res.truncated_lengths and not res.exact
    assert not res.escalated_lengths


def test_eps_violation_escalates(monkeypatch):
    """An eps far below the real survey error trips the runtime check
    (observed rescore-vs-survey error >= eps) and escalates — the
    result stays exact even when the error assumption is wrong
    (round-3 advisor finding: exactness silently rested on the
    empirical eps)."""
    T = _walk(600, 46)
    res = multi_length_discords(T, ms=[12, 20], eps=1e-12)
    assert set(res.escalated_lengths) == {12, 20}
    assert res.exact
    exp = brute_force_multi_length_discords(T, [12, 20])
    for got, want in zip(res.per_length, exp):
        assert got.distance == pytest.approx(want.distance, abs=1e-9)


def test_motifs_escalation_matches_brute_force(monkeypatch):
    from mpx.merlin import (
        brute_force_multi_length_motifs,
        multi_length_motifs,
    )
    import mpx.merlin as merlin_mod

    monkeypatch.setattr(merlin_mod, "_MAX_CANDIDATES", 8)
    rng = np.random.default_rng(47)
    t = np.arange(700)
    T = np.sin(2 * np.pi * t / 40) + 1e-3 * rng.standard_normal(700)
    res = multi_length_motifs(T, ms=[16, 24])
    assert res.escalated_lengths and res.exact
    exp = brute_force_multi_length_motifs(T, [16, 24])
    for got, want in zip(res.per_length, exp):
        assert got.distance == pytest.approx(want.distance, abs=1e-9)
