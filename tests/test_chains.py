"""Time series chains (ATSC / ALLC) vs naive link-following."""

import numpy as np
import pytest

from mpx import MatrixProfileConfig
from mpx.chains import (
    all_chains,
    anchored_chain,
    chain_lengths,
    chain_links,
    compute_chains,
)
from tests.conftest import random_walk
from tests.test_left_right import brute_force_left_right


def drifting_series(bursts=6, m=32, gap=96, seed=7):
    """Noise with planted sine bursts whose shape drifts burst-to-burst."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 2 * np.pi, m)
    parts, starts, pos = [], [], 0
    for k in range(bursts):
        parts.append(rng.normal(0, 0.3, gap))
        pos += gap
        burst = np.sin(t) + 0.1 * k * np.sin(2 * t)
        parts.append(burst + rng.normal(0, 0.01, m))
        starts.append(pos)
        pos += m
    parts.append(rng.normal(0, 0.3, gap))
    return np.concatenate(parts), starts


def test_lengths_match_naive_follow():
    T = random_walk(600, seed=11)
    _, il, _, ir = brute_force_left_right(T, 16)
    lengths = chain_lengths(il, ir)
    for anchor in range(len(il)):
        assert lengths[anchor] == anchored_chain(il, ir, anchor).shape[0]


def test_chain_properties():
    T = random_walk(800, seed=23)
    _, il, _, ir = brute_force_left_right(T, 24)
    nxt = chain_links(il, ir)
    chains = all_chains(il, ir)
    seen = set()
    for c in chains:
        assert len(c) >= 2
        assert np.all(np.diff(c) > 0)  # strictly forward in time
        for a, b in zip(c[:-1], c[1:]):
            assert ir[a] == b and il[b] == a  # bidirectional links
        assert nxt[c[-1]] == -1  # maximal
        assert not (set(c.tolist()) & seen)  # chains are disjoint
        seen.update(c.tolist())
    # longest-first ordering
    assert all(len(a) >= len(b) for a, b in zip(chains, chains[1:]))


def test_drifting_pattern_chain():
    T, starts = drifting_series()
    cfg = MatrixProfileConfig(m=32, dtype="float64", band=64, chunk=128,
                              tile_rows=8, tile_cols=8)
    # ATSC anchored at the first planted burst tracks the drift
    res = compute_chains(T, cfg, anchor=starts[0])
    assert res.length >= 4
    assert np.all(np.diff(res.chain) > 0)
    # every chain member sits on a planted burst
    for idx in res.chain:
        assert min(abs(idx - s) for s in starts) <= 8
    # the unanchored chain is at least as long as any anchored one
    unanchored = compute_chains(T, cfg)
    assert unanchored.length >= res.length
    assert unanchored.length == res.lengths.max()


def test_compute_chains_matches_oracle_links():
    T = random_walk(512, seed=41)
    cfg = MatrixProfileConfig(m=16, dtype="float64", band=64, chunk=128,
                              tile_rows=8, tile_cols=8)
    res = compute_chains(T, cfg)
    _, il, _, ir = brute_force_left_right(T, 16)
    # device left/right indices may differ on exact ties; chain lengths
    # from the oracle links must match where the links agree
    if np.array_equal(res.mpi_left, il) and np.array_equal(res.mpi_right, ir):
        np.testing.assert_array_equal(res.lengths, chain_lengths(il, ir))
    assert res.lengths.max() == res.length


def test_swapped_arguments_rejected():
    T = random_walk(300, seed=5)
    _, il, _, ir = brute_force_left_right(T, 16)
    if (chain_links(il, ir) >= 0).any():
        with pytest.raises(ValueError, match="swap"):
            chain_links(ir, il)


def test_anchor_out_of_range():
    _, il, _, ir = brute_force_left_right(random_walk(200, seed=3), 16)
    with pytest.raises(ValueError, match="out of range"):
        anchored_chain(il, ir, len(il))
