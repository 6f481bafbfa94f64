"""DAMP anomaly tier: batch vs oracle, online vs batch, alerting."""

import numpy as np
import pytest

from mpx import MatrixProfileConfig
from mpx.damp import Anomaly, OnlineAnomalyDetector, compute_damp
from tests.conftest import random_walk
from tests.test_left_right import brute_force_left_right

CFG = dict(dtype="float64", band=64, chunk=128, tile_rows=8, tile_cols=16)


def with_anomaly(n=900, m=32, pos=700, seed=3):
    rng = np.random.default_rng(seed)
    T = np.sin(2 * np.pi * np.arange(n) / 50) + rng.normal(0, 0.05, n)
    T[pos : pos + m // 2] += rng.normal(0, 1.5, m // 2)  # burst anomaly
    return T


def test_batch_matches_left_oracle():
    T = random_walk(700, seed=9)
    res = compute_damp(T, config=MatrixProfileConfig(m=24, **CFG), k=3)
    bl, bli, _, _ = brute_force_left_right(T, 24)
    fin = np.isfinite(bl)
    np.testing.assert_allclose(res.scores[fin], bl[fin], atol=1e-8)
    # top discord is the scorable argmax
    assert res.discords[0].distance == pytest.approx(bl[fin].max())


def test_batch_finds_planted_anomaly():
    m = 32
    T = with_anomaly(m=m)
    res = compute_damp(T, config=MatrixProfileConfig(m=m, **CFG),
                       split=100, k=2)
    assert abs(res.discords[0].index - 700) <= m
    # discords respect the suppression zone
    if len(res.discords) > 1:
        assert abs(res.discords[0].index - res.discords[1].index) >= m // 2


def test_online_equals_batch():
    m = 32
    T = with_anomaly(m=m)
    det = OnlineAnomalyDetector(T[:300], config=MatrixProfileConfig(
        m=m, **CFG))
    for o in range(300, len(T), 97):
        det.append(T[o : o + 97])
    w = len(T) - m + 1
    online = det.scores(det.split, w)
    batch = compute_damp(T, config=MatrixProfileConfig(m=m, **CFG))
    np.testing.assert_allclose(online, batch.scores[det.split :],
                               atol=1e-8)
    assert det.discord is not None
    assert abs(det.discord.index - 700) <= m


def test_bsf_alert_semantics():
    m = 32
    T = with_anomaly(m=m)
    det = OnlineAnomalyDetector(T[:300], config=MatrixProfileConfig(
        m=m, **CFG))
    alerts = []
    for o in range(300, len(T), 64):
        alerts += det.append(T[o : o + 64])
    # BSF alerts are monotone increasing in distance
    d = [a.distance for a in alerts]
    assert all(x < y for x, y in zip(d, d[1:]))
    # the planted anomaly is the final (strongest) alert
    assert abs(alerts[-1].index - 700) <= m
    assert alerts[-1] == det.discord


def test_threshold_alerts():
    m = 32
    T = with_anomaly(m=m)
    det = OnlineAnomalyDetector(
        T[:300], config=MatrixProfileConfig(m=m, **CFG), threshold=4.0)
    alerts = []
    for o in range(300, len(T), 128):
        alerts += det.append(T[o : o + 128])
    assert alerts and all(a.distance > 4.0 for a in alerts)
    assert all(abs(a.index - 700) <= m for a in alerts)


def test_flat_windows_do_not_alert():
    m = 16
    rng = np.random.default_rng(4)
    T = rng.normal(0, 1, 300)
    det = OnlineAnomalyDetector(T, config=MatrixProfileConfig(m=m, **CFG))
    alerts = det.append(np.zeros(64))  # constant tail: flat windows
    flat = [a for a in alerts if a.distance > np.sqrt(2 * m * (1 + 1e10))]
    assert not flat


def test_split_validation():
    T = random_walk(300, seed=2)
    with pytest.raises(ValueError, match="split"):
        compute_damp(T, config=MatrixProfileConfig(m=16, **CFG),
                     split=5000)
