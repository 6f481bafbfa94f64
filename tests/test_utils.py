"""Logger / Timer / BenchmarkProfile and property tests for the
aggregate-merge algebra."""

import numpy as np
import jax.numpy as jnp

from mpx.ops.aggregates import Aggregates, merge_aggregates, merge_window
from mpx.utils.logging import Logger, LogLevel
from mpx.utils.profile import BenchmarkProfile, phase
from mpx.utils.timer import Timer


def test_logger_levels(capsys):
    Logger.verbose = False
    Logger.info("hello")
    Logger.verbose_log("hidden")
    out = capsys.readouterr().out
    assert "hello" in out and "hidden" not in out
    Logger.verbose = True
    Logger.verbose_log("shown")
    assert "shown" in capsys.readouterr().out
    Logger.error("bad")
    assert "bad" in capsys.readouterr().err
    Logger.verbose = False


def test_timer_pretty():
    assert Timer.pretty(500) == "500 ns"
    assert Timer.pretty(1_500_000) == "1.500 ms"
    assert Timer.pretty(2_500_000_000) == "2.500 s"
    t = Timer()
    assert t.elapsed() >= 0


def test_benchmark_profile_report():
    prof = BenchmarkProfile()
    with phase(prof, "1. Phase A"):
        pass
    prof.push("2. Phase B", 1000, "item")
    text = prof.report()
    assert "1. Phase A" in text and "2. Phase B" in text and "%" in text
    assert "Phase B" in prof.as_json()


def _agg(vals, idxs):
    return Aggregates(jnp.asarray(vals, jnp.float32), jnp.asarray(idxs, jnp.int32))


def test_merge_is_associative_and_commutative_on_values():
    rng = np.random.default_rng(0)
    a = _agg(rng.standard_normal(32), rng.integers(0, 9, 32))
    b = _agg(rng.standard_normal(32), rng.integers(0, 9, 32))
    c = _agg(rng.standard_normal(32), rng.integers(0, 9, 32))
    left = merge_aggregates(merge_aggregates(a, b), c)
    right = merge_aggregates(a, merge_aggregates(b, c))
    np.testing.assert_array_equal(np.asarray(left.value), np.asarray(right.value))
    np.testing.assert_array_equal(np.asarray(left.index), np.asarray(right.index))
    ab = merge_aggregates(a, b)
    ba = merge_aggregates(b, a)
    np.testing.assert_array_equal(np.asarray(ab.value), np.asarray(ba.value))


def test_merge_incumbent_wins_ties():
    a = _agg([1.0], [3])
    b = _agg([1.0], [7])
    out = merge_aggregates(a, b)
    assert int(out.index[0]) == 3  # first-seen semantics


def test_merge_window_offsets():
    g = _agg(np.full(10, -1e12), np.full(10, -1))
    win = _agg([0.5, 0.7], [4, 5])
    out = merge_window(g, win, 3)
    v = np.asarray(out.value)
    assert v[3] == np.float32(0.5) and v[4] == np.float32(0.7)
    assert np.all(v[:3] == np.float32(-1e12))
