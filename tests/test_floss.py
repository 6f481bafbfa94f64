"""FLOSS online segmentation: right-profile streaming exactness,
sliding-window egress, analytic one-directional CAC, boundary detection."""

import numpy as np
import pytest

from mpx.analysis import extract_regimes, one_directional_cac
from mpx.floss import Floss
from mpx.reference import rolling_statistics
from mpx.streaming import StreamingMatrixProfile
from tests.conftest import random_walk
from tests.helpers import assert_profile_close


def right_profile_oracle(T, m):
    """Brute-force RIGHT matrix profile (independent of the mpx
    kernels): full normalized-windows Gram matrix, min over j - i >=
    excl."""
    T = np.asarray(T, np.float64)
    mu, _, _, inv = rolling_statistics(T, m)
    w = T.shape[0] - m + 1
    W = np.lib.stride_tricks.sliding_window_view(T, m)
    U = (W - mu[:, None]) * np.where(np.isfinite(inv), inv, 0.0)[:, None]
    P = U @ U.T
    i = np.arange(w)
    valid = (i[None, :] - i[:, None]) >= m // 4
    valid &= np.isfinite(inv)[None, :] & np.isfinite(inv)[:, None]
    D2 = np.where(valid, 2 * m * (1 - np.clip(P, -1, 1)), np.inf)
    has = np.isfinite(D2).any(axis=1)
    MPI = np.where(has, D2.argmin(axis=1), -1).astype(np.int32)
    MP = np.where(has, np.sqrt(D2[i, np.clip(MPI, 0, w - 1)]), np.inf)
    return MP, MPI


def two_regime_series(n=1200, split=600, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    T = np.concatenate([
        np.sin(2 * np.pi * t[:split] / 24.0),
        np.sign(np.sin(2 * np.pi * t[split:] / 61.0)) * 0.8,
    ])
    return T + 0.05 * rng.standard_normal(n)


def test_right_mode_matches_oracle_f64():
    T = random_walk(700, seed=91)
    m = 32
    smp = StreamingMatrixProfile(T[:400], m=m, dtype="float64", mode="right")
    for start in range(400, 700, 70):
        smp.append(T[start : start + 70])
    MP, MPI = smp.profile()
    MP_exp, MPI_exp = right_profile_oracle(T, m)
    fin = np.isfinite(MP_exp)
    assert not fin[-(m // 4):].any()  # trailing windows have no right arc
    assert (MPI[~fin] < 0).all()
    assert_profile_close(T, m, MP[fin], MPI[fin],
                         MP_exp[fin], MPI_exp[fin], eps=1e-8)


def test_trim_head_matches_fresh_state():
    T = random_walk(900, seed=93)
    m = 24
    smp = StreamingMatrixProfile(T[:600], m=m, dtype="float64", mode="right")
    smp.append(T[600:])
    smp.trim_head(300)
    assert smp.offset == 300
    MP, MPI = smp.profile()
    MP_exp, MPI_exp = right_profile_oracle(T[300:], m)
    fin = np.isfinite(MP_exp)
    assert_profile_close(T[300:], m, MP[fin], MPI[fin],
                         MP_exp[fin], MPI_exp[fin], eps=1e-8)
    # and appends keep working on the rebased state
    more = random_walk(80, seed=94) + T[-1]
    smp.append(more)
    T2 = np.concatenate([T[300:], more])
    MP2, MPI2 = smp.profile()
    MP_exp2, MPI_exp2 = right_profile_oracle(T2, m)
    fin2 = np.isfinite(MP_exp2)
    assert_profile_close(T2, m, MP2[fin2], MPI2[fin2],
                         MP_exp2[fin2], MPI_exp2[fin2], eps=1e-8)


def test_trim_head_guards():
    T = random_walk(300, seed=95)
    full = StreamingMatrixProfile(T, m=16, dtype="float64")
    with pytest.raises(ValueError, match="mode='right'"):
        full.trim_head(10)
    right = StreamingMatrixProfile(T, m=16, dtype="float64", mode="right")
    with pytest.raises(ValueError, match="fewer than"):
        right.trim_head(290)
    right.trim_head(0)  # no-op
    assert right.offset == 0


def test_one_directional_cac_null_model():
    """Uniform random right arcs should score ~1 everywhere (the curve
    is normalized by the exact analytic expectation)."""
    rng = np.random.default_rng(11)
    w, m = 2000, 16
    MPI = np.full(w, -1, np.int64)
    MPI[: w - 1] = rng.integers(np.arange(1, w), w)
    cac = one_directional_cac(MPI, m)
    mid = cac[100 : w - 100]
    assert abs(mid.mean() - 1.0) < 0.05
    assert mid.min() > 0.7
    assert cac.max() <= 1.0
    assert (cac[:m] == 1.0).all() and (cac[-m:] == 1.0).all()


def test_one_directional_cac_batch_boundary():
    T = two_regime_series()
    m = 32
    _, MPI = right_profile_oracle(T, m)
    cac = one_directional_cac(MPI, m)
    (r,) = extract_regimes(cac, m, k=1)
    assert abs(r - 600) <= 2 * m


def test_floss_streaming_detects_boundary():
    T = two_regime_series()
    m = 32
    fl = Floss(T[:400], m=m, window=1200, dtype="float64")
    for start in range(400, len(T), 97):
        fl.append(T[start : start + 97])
    # streaming CAC tracks the batch one-directional CAC of the same
    # window (tiny tolerance: equidistant ties on periodic data may
    # break differently between the oracle and the device kernels)
    _, MPI_exp = right_profile_oracle(T, m)
    np.testing.assert_allclose(
        fl.cac(), one_directional_cac(MPI_exp, m), atol=0.05
    )
    (r,) = fl.regimes(k=1)
    assert abs(r - 600) <= 2 * m
    assert fl.score < 0.2


def test_floss_sliding_window_absolute_positions():
    """With a window smaller than the stream, egress trims the head and
    regime positions stay in absolute stream coordinates."""
    T = two_regime_series(n=2000, split=1400, seed=13)
    m = 32
    fl = Floss(T[:600], m=m, window=900, dtype="float64")
    for start in range(600, len(T), 111):
        fl.append(T[start : start + 111])
    assert fl.offset > 0  # egress happened
    assert fl.offset + fl.series.shape[0] == 2000  # absolute bookkeeping
    assert fl.series.shape[0] <= int(fl.slack * fl.window)
    # the window [1100, 2000) straddles the 1400 boundary
    (r,) = fl.regimes(k=1)
    assert abs(r - 1400) <= 2 * m
    # exactness under egress: matches the batch CAC of the retained tail
    _, MPI_exp = right_profile_oracle(T[fl.offset :], m)
    np.testing.assert_allclose(
        fl.cac(), one_directional_cac(MPI_exp, m), atol=0.05
    )


def test_floss_cli(tmp_path, capsys):
    from mpx.cli import main
    from mpx.io.tsb import write_binary

    T = two_regime_series(n=1200, split=600, seed=7)
    inp = str(tmp_path / "ts.tsb")
    write_binary(inp, T, "double")
    # default --window must retain the WHOLE series, not the warmup
    rc = main(["floss", "-i", inp, "-m", "32", "--step", "128",
               "--dtype", "float64", "--threshold", "0.45"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "window [0, 1200)" in out
    assert "regime boundaries" in out
    pos = int(out.split("CAC):")[1].split()[0])
    assert abs(pos - 600) <= 64
    # argument validation (main catches ValueError -> nonzero rc)
    assert main(["floss", "-i", inp, "-m", "32", "--step", "0"]) != 0
    assert "--step" in capsys.readouterr().err
    assert main(["floss", "-i", inp, "-m", "32", "--init", "0"]) != 0
    assert "--init" in capsys.readouterr().err
    assert main(["floss", "-i", inp, "-m", "32", "--init", "1200"]) != 0
    assert "whole series" in capsys.readouterr().err


def test_floss_init_longer_than_window():
    T = two_regime_series(n=1000, split=500, seed=17)
    fl = Floss(T, m=32, window=800)
    assert fl.offset == 200
    (r,) = fl.regimes(k=1)
    assert abs(r - 500) <= 64
