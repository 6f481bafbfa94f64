"""STUMPY-compatible shim: every entry point against mpx oracles."""

import numpy as np
import pytest

import mpx.compat.stumpy as st
from mpx.reference import compute_matrix_profile_reference


def _walk(n, seed):
    return np.cumsum(np.random.default_rng(seed).standard_normal(n))


def test_stump_selfjoin_shape_and_values():
    T = _walk(600, 21)
    out = st.stump(T, 16)
    g, _ = compute_matrix_profile_reference(T, 16)
    assert out.shape == (585, 4)
    np.testing.assert_allclose(out[:, 0].astype(np.float64), g, atol=2e-3)
    i = 300
    assert out[i, 2] < i < out[i, 3]  # left idx < i < right idx


def test_stump_merged_matches_left_right_min():
    T = _walk(400, 22)
    out = st.stump(T, 12)
    from mpx.config import MatrixProfileConfig
    from mpx.driver import compute_matrix_profile

    PL, IL, PR, IR = compute_matrix_profile(
        T, config=MatrixProfileConfig(m=12), left_right=True)
    both = (np.asarray(IL) >= 0) & (np.asarray(IR) >= 0)
    exp = np.minimum(np.asarray(PL)[both], np.asarray(PR)[both])
    np.testing.assert_allclose(out[both, 0].astype(float), exp, atol=1e-6)


def test_stump_abjoin_and_topk():
    A, B = _walk(500, 23), _walk(400, 24)
    ab = st.stump(A, 16, B)
    from mpx.abjoin import compute_ab_join

    res = compute_ab_join(A, B, 16)
    np.testing.assert_allclose(ab[:, 0].astype(float),
                               np.asarray(res.mp_a), atol=1e-6)
    assert (ab[:, 2] == -1).all() and (ab[:, 3] == -1).all()

    k3 = st.stump(A, 16, k=3)
    assert k3.shape == (485, 8)
    from mpx.topk import compute_topk_profile

    D, _ = compute_topk_profile(A, 16, k=3)
    np.testing.assert_allclose(k3[:, 0].astype(float),
                               np.asarray(D)[:, 0], atol=1e-6)


def test_distributed_aliases():
    T = _walk(300, 34)
    out = st.stump(T, 12)
    a = st.stumped(None, T, 12)
    b = st.gpu_stump(T, 12, device_id=3)
    assert (a == out).all() and (b == out).all()
    Tm = np.cumsum(
        np.random.default_rng(35).standard_normal((2, 300)), axis=1)
    P1, I1 = st.mstump(Tm, 12)
    P2, I2 = st.mstumped(None, Tm, 12)
    np.testing.assert_allclose(P1, P2)


def test_stump_validation():
    T = _walk(100, 25)
    with pytest.raises(NotImplementedError):
        st.stump(T, 8, p=1.0)
    with pytest.raises(ValueError):
        st.stump(T, 8, ignore_trivial=False)


def test_aamp_matches_tier():
    T = _walk(300, 26)
    out = st.aamp(T, 12)
    from mpx.aamp import compute_aamp_profile

    D, I = compute_aamp_profile(T, 12)
    np.testing.assert_allclose(out[:, 0].astype(float),
                               np.asarray(D), atol=1e-5)
    assert (out[:, 1].astype(int) == np.asarray(I)).all()


def test_mass_match_motifs():
    T = _walk(500, 27)
    D = st.mass(T[:16], T)
    assert D.shape == (485,) and D[0] == pytest.approx(0.0, abs=1e-6)
    mt = st.match(T[100:116], T)
    assert mt.shape[1] == 2 and mt[0, 1] == 100
    P = st.stump(T, 16)[:, 0].astype(float)
    md, mi = st.motifs(T, P, max_motifs=2, max_matches=5)
    assert md.shape == (2, 5) and (mi[:, 0] >= 0).all()
    # first listed occurrence of each motif is its own best match
    assert md[0, 0] == pytest.approx(0.0, abs=1e-5)


def test_fluss_and_floss():
    T = _walk(600, 28)
    out = st.stump(T, 16)
    cac, locs = st.fluss(out[:, 1].astype(np.int64), 16, n_regimes=3)
    assert cac.shape == (585,) and locs.shape == (2,)
    fl = st.floss(None, T, 16, 16)
    fl.append(np.random.default_rng(0).standard_normal(50))
    assert fl.cac().shape[0] > 0
    with pytest.raises(NotImplementedError):
        st.floss(None, T, 16, 32)


def test_mstump_subspace():
    Tm = np.cumsum(
        np.random.default_rng(29).standard_normal((3, 400)), axis=1)
    P, I = st.mstump(Tm, 12)
    assert P.shape == (3, 389) and I.shape == (3, 389)
    from mpx.mstamp import compute_multidim_profile

    res = compute_multidim_profile(Tm, 12)
    np.testing.assert_allclose(P, np.asarray(res.PMP), atol=1e-6)
    dims = st.subspace(Tm, 12, 10, int(I[1, 10]), 1)
    assert dims.shape == (2,)  # STUMPY k=1 -> 2 dimensions


def test_chains_snippets_ostinato_mpdist():
    T = _walk(600, 30)
    out = st.stump(T, 16)
    IL = out[:, 2].astype(np.int64)
    IR = out[:, 3].astype(np.int64)
    ch = st.atsc(IL, IR, 5)
    assert ch[0] == 5
    S, C = st.allc(IL, IR)
    assert len(S) > 0 and C.shape[0] >= 2
    sv, si, sf = st.snippets(T, 50, 2)
    assert sv.shape == (2, 50) and (sf >= 0).all()
    B = _walk(400, 31)
    r, tsi, ssi = st.ostinato([T, B, _walk(350, 32)], 16)
    assert r > 0 and tsi in (0, 1, 2)
    assert st.mpdist(T, B, 16) > 0


def test_scrump_and_stimp():
    T = _walk(400, 33)
    g, _ = compute_matrix_profile_reference(T, 16)
    sc = st.scrump(T, 16, percentage=0.25)
    prev = np.full_like(sc.P_, np.inf)
    for _ in range(6):
        sc.update()
        assert (sc.P_ <= prev + 1e-9).all()  # anytime: monotone
        prev = sc.P_.copy()
    np.testing.assert_allclose(sc.P_, g, atol=2e-3)  # exhausted = exact
    stp = st.stimp(T, 8, 24, 8)
    assert list(stp.M_) == [8, 16, 24]
    stp.update()
    assert not np.isnan(stp.PAN_[0]).all()
    assert np.isnan(stp.PAN_[1]).all()
    stp.update(); stp.update(); stp.update()
    assert not np.isnan(stp.PAN_[2]).all()


def test_mmotifs_recovers_planted_multidim_motif():
    rng = np.random.default_rng(9)
    d, n, m = 4, 600, 32
    T = np.cumsum(rng.standard_normal((d, n)), axis=1)
    pat0 = np.sin(np.linspace(0, 4 * np.pi, m)) * 4
    pat1 = np.cos(np.linspace(0, 6 * np.pi, m)) * 4
    for pos in (100, 400):
        T[0, pos : pos + m] = pat0 + 0.01 * rng.standard_normal(m)
        T[1, pos : pos + m] = pat1 + 0.01 * rng.standard_normal(m)
    P, I = st.mstump(T, m)
    md, mi, subs, mdls = st.mmotifs(T, P, I, max_motifs=2, max_matches=4)
    assert len(subs) >= 1
    assert set(subs[0].tolist()) == {0, 1}  # MDL picks the planted dims
    got = [int(x) for x in mi[0] if x >= 0]
    assert any(abs(x - 100) <= 3 for x in got)
    assert any(abs(x - 400) <= 3 for x in got)
    assert mdls[0] is not None and np.argmax(mdls[0]) + 1 == 2
    # fixed-k path skips MDL
    _, _, subs2, mdls2 = st.mmotifs(T, P, I, k=2, max_motifs=1)
    assert mdls2[0] is None and len(subs2[0]) == 2


def test_stumpi_streaming_equals_batch():
    """Replaying appends through stumpi must reproduce the batch stump
    of the final series (f32 tolerance; indices may differ only on
    equidistant ties — checked via exact rescoring)."""
    import sys

    from tests.helpers import assert_profile_close

    T = _walk(560, 41)
    m = 32
    s = st.stumpi(T[:384], m, egress=False)
    for t in T[384:500]:
        s.update(t)  # scalar appends (the STUMPY contract)
    s.update(T[500:])  # array append (mpx extension)

    out = st.stump(T, m)
    P_b = out[:, 0].astype(np.float64)
    I_b = out[:, 1].astype(np.int64)
    assert s.P_.shape == P_b.shape
    assert_profile_close(T, m, s.P_, s.I_, P_b, I_b, eps=4e-3)

    # left profile vs the batch left column
    from mpx.config import MatrixProfileConfig
    from mpx.driver import compute_matrix_profile

    PL, IL, _, _ = compute_matrix_profile(
        T, config=MatrixProfileConfig(m=m), left_right=True)
    PL = np.asarray(PL, np.float64)
    IL = np.asarray(IL, np.int64)
    PL = np.where(IL >= 0, PL, np.inf)
    fin = np.isfinite(PL) & np.isfinite(s.left_P_)
    np.testing.assert_allclose(s.left_P_[fin], PL[fin], atol=4e-3)
    assert ((s.left_P_ == np.inf) == (PL == np.inf)).all()


def test_stumpi_egress_view_slides():
    """egress=True: P_/I_/T_ keep the initial window size; indices are
    absolute stream positions; P_ values match the tail of the
    grow-only stream (mpx's documented egress divergence)."""
    T = _walk(300, 42)
    m = 16
    w0 = 200 - m + 1
    s = st.stumpi(T[:200], m, egress=True)
    g = st.stumpi(T[:200], m, egress=False)
    for t in T[200:]:
        s.update(t)
        g.update(t)
    assert s.P_.shape == (w0,)
    assert s.T_.shape == (w0 + m - 1,)
    assert g.P_.shape == (300 - m + 1,)
    np.testing.assert_allclose(s.P_, g.P_[-w0:], atol=0)
    np.testing.assert_array_equal(s.I_, g.I_[-w0:])
    np.testing.assert_array_equal(s.T_, T[-(w0 + m - 1):])


def test_stumpi_guards():
    T = _walk(200, 43)
    with pytest.raises(NotImplementedError):
        st.stumpi(T, 16, normalize=False)
    with pytest.raises(NotImplementedError):
        st.stumpi(T, 16, k=2)
    with pytest.raises(NotImplementedError):
        st.stumpi(T, 16, p=1.0)


def test_aampdist_matches_brute_force():
    """aampdist vs an explicit numpy raw-distance oracle."""
    A, B = _walk(300, 44), _walk(260, 45)
    m = 24
    wa, wb = 300 - m + 1, 260 - m + 1
    WA = np.lib.stride_tricks.sliding_window_view(A, m)
    WB = np.lib.stride_tricks.sliding_window_view(B, m)
    D = np.sqrt(((WA[:, None, :] - WB[None, :, :]) ** 2).sum(axis=2))
    joined = np.concatenate([D.min(axis=1), D.min(axis=0)])
    k = int(np.ceil(0.05 * (300 + 260)))
    expect = np.partition(joined, k - 1)[k - 1]
    got = st.aampdist(A, B, m)
    assert got == pytest.approx(expect, abs=1e-3)
    with pytest.raises(NotImplementedError):
        st.aampdist(A, B, m, p=1.0)
