"""Sum-threshold / frequency profiles vs the brute-force oracle."""

import numpy as np
import pytest

from mpx import MatrixProfileConfig
from mpx.thresh import brute_force_sum_thresh, compute_sum_thresh
from tests.conftest import random_walk


@pytest.mark.parametrize("threshold", [0.0, 0.6, -0.5])
def test_f64_matches_oracle(threshold):
    T = random_walk(700, seed=17)
    cfg = MatrixProfileConfig(m=24, dtype="float64", band=64, chunk=128,
                              tile_rows=8, tile_cols=16)
    sums, cnts = compute_sum_thresh(T, config=cfg, threshold=threshold)
    esums, ecnts = brute_force_sum_thresh(T, 24, threshold)
    np.testing.assert_array_equal(cnts, ecnts)
    np.testing.assert_allclose(sums, esums, atol=1e-8)


def test_f32_close_to_oracle():
    T = random_walk(900, seed=29)
    cfg = MatrixProfileConfig(m=32, dtype="float32", band=64, chunk=128,
                              tile_rows=8, tile_cols=16)
    sums, cnts = compute_sum_thresh(T, config=cfg, threshold=0.5)
    esums, ecnts = brute_force_sum_thresh(T, 32, 0.5)
    # f32 correlations near the threshold may flip; sums stay close and
    # counts may differ only by such borderline pairs
    np.testing.assert_allclose(sums, esums, atol=5e-3)
    assert np.abs(cnts.astype(np.int64) - ecnts).max() <= 2


def test_repeated_motif_has_high_count():
    rng = np.random.default_rng(3)
    m = 32
    T = rng.normal(0, 0.5, 1200)
    pat = np.sin(np.linspace(0, 4 * np.pi, m))
    spots = [100, 400, 700, 1000]
    for s in spots:
        T[s : s + m] += 3 * pat
    cfg = MatrixProfileConfig(m=m, dtype="float64", band=64, chunk=128,
                              tile_rows=8, tile_cols=16)
    sums, cnts = compute_sum_thresh(T, config=cfg, threshold=0.8)
    # each planted window sees the other copies above 0.8 correlation;
    # background noise windows see none
    for s in spots:
        assert cnts[s] >= len(spots) - 1
    assert np.median(cnts) == 0
    assert sums[spots].min() > 0.8 * (len(spots) - 1)


def test_threshold_is_runtime_scalar():
    # two thresholds, same executable: results differ, no error
    T = random_walk(400, seed=5)
    cfg = MatrixProfileConfig(m=16, dtype="float32", band=64, chunk=64,
                              tile_rows=8, tile_cols=16)
    s0, c0 = compute_sum_thresh(T, config=cfg, threshold=0.0)
    s9, c9 = compute_sum_thresh(T, config=cfg, threshold=0.9)
    assert c9.sum() < c0.sum()
    assert s9.sum() < s0.sum()


def test_validation():
    T = random_walk(300, seed=1)
    with pytest.raises(ValueError, match="threshold"):
        compute_sum_thresh(T, 16, threshold=1.5)
    with pytest.raises(ValueError, match="single-device"):
        compute_sum_thresh(
            T, config=MatrixProfileConfig(m=16, num_shards=2))


def test_dispatch_grouping_is_exact():
    """Grouped dispatches (carried accumulators + dummy padding jobs)
    must be bit-identical to the single-dispatch run."""
    T = random_walk(600, seed=77)
    base = dict(m=16, dtype="float64", band=32, chunk=64,
                tile_rows=8, tile_cols=16)
    one = compute_sum_thresh(
        T, config=MatrixProfileConfig(**base, dispatch_group=0),
        threshold=0.3)
    grouped = compute_sum_thresh(
        T, config=MatrixProfileConfig(**base, dispatch_group=3),
        threshold=0.3)
    np.testing.assert_array_equal(one[0], grouped[0])
    np.testing.assert_array_equal(one[1], grouped[1])
