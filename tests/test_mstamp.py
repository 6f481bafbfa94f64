"""mSTAMP multi-dimensional profiles vs a brute-force oracle, the k=1..d
semantics, the d=1 equivalence with the standard profile, and the
zero-variance contract."""

import jax.numpy as jnp
import numpy as np
import pytest

from mpx.config import MatrixProfileConfig
from mpx.mstamp import compute_multidim_profile, multidim_motif
from mpx.reference import exclusion_zone


def mstamp_oracle(T: np.ndarray, m: int, include=(), discords=False):
    """O(d n^2 m) reference: per-dim z-norm distances, ordered across
    dims (ascending; descending for discords; include-first), prefix-
    means, min over the non-trivial pairs."""
    d, n = T.shape
    w = n - m + 1
    excl = exclusion_zone(m)
    # per-dim normalized windows; flat windows -> None (never match)
    U = np.full((d, w, m), np.nan)
    flat = np.zeros((d, w), dtype=bool)
    for t in range(d):
        for i in range(w):
            win = T[t, i : i + m].astype(np.float64)
            c = win - win.mean()
            ssq = float(c @ c)
            if ssq <= 1e-13 * float(win @ win) or ssq == 0.0:
                flat[t, i] = True
            else:
                U[t, i] = c / np.sqrt(ssq)
    PMP = np.full((d, w), np.inf)
    PMPI = np.full((d, w), -1, np.int64)
    for i in range(w):
        for j in range(w):
            if abs(j - i) < excl:
                continue
            dd = np.empty(d)
            for t in range(d):
                if flat[t, i] or flat[t, j]:
                    dd[t] = np.inf
                else:
                    p = float(U[t, i] @ U[t, j])
                    dd[t] = np.sqrt(max(2.0 * m * (1.0 - p), 0.0))
            srt = (lambda x: np.sort(x)[::-1]) if discords else np.sort
            if include:
                inc = list(include)
                rest = [t for t in range(d) if t not in set(inc)]
                dd_o = np.concatenate([srt(dd[inc]), srt(dd[rest])]
                                      if rest else [srt(dd[inc])])
            else:
                dd_o = srt(dd)
            dk = np.cumsum(dd_o) / np.arange(1, d + 1)
            for k in range(d):
                if dk[k] < PMP[k, i]:
                    PMP[k, i] = dk[k]
                    PMPI[k, i] = j
    return PMP, PMPI


def assert_multiprofile_close(got, want_P, want_I, tol):
    np.testing.assert_allclose(got.PMP, want_P, rtol=0, atol=tol)
    # index ties allowed iff equidistant (the 1-D harness rule)
    mism = got.PMPI != want_I
    assert (got.PMPI[~np.isfinite(want_P)] == -1).all()
    if mism.any():
        assert np.allclose(got.PMP[mism], want_P[mism], atol=tol)


@pytest.mark.parametrize("dtype,tol", [("float32", 2e-3), ("float64", 1e-8)])
def test_mstamp_matches_oracle(dtype, tol):
    rng = np.random.default_rng(31)
    d, n, m = 3, 230, 16
    T = np.cumsum(rng.standard_normal((d, n)), axis=1)
    cfg = MatrixProfileConfig(m=m, dtype=dtype, band=32, chunk=64)
    prof = compute_multidim_profile(T, config=cfg)
    P, I = mstamp_oracle(T, m)
    assert prof.PMP.shape == (d, n - m + 1)
    assert_multiprofile_close(prof, P, I, tol)


def test_mstamp_d1_equals_standard_profile():
    from mpx.reference import compute_matrix_profile_reference

    rng = np.random.default_rng(37)
    T = np.cumsum(rng.standard_normal(400))
    m = 24
    prof = compute_multidim_profile(T[None, :], config=MatrixProfileConfig(
        m=m, dtype="float64", band=64, chunk=64))
    MP, MPI = compute_matrix_profile_reference(T, m)
    np.testing.assert_allclose(prof.PMP[0], MP, atol=1e-8)
    mism = prof.PMPI[0] != MPI
    assert np.allclose(prof.PMP[0][mism], MP[mism], atol=1e-8)


def test_mstamp_flat_dimension_drops_out():
    # One dimension entirely constant: its distances are +inf, so the
    # k=d profile is +inf everywhere (flat windows never match) while
    # k<d profiles ignore it.
    rng = np.random.default_rng(41)
    n, m = 200, 16
    T = np.stack([np.cumsum(rng.standard_normal(n)),
                  np.zeros(n)])
    prof = compute_multidim_profile(T, config=MatrixProfileConfig(
        m=m, dtype="float64", band=32, chunk=64))
    assert not np.isfinite(prof.PMP[1]).any()
    assert (prof.PMPI[1] == -1).all()
    P, I = mstamp_oracle(T, m)
    assert_multiprofile_close(prof, P, I, 1e-8)


def test_mstamp_input_validation_and_quant():
    rng = np.random.default_rng(43)
    with pytest.raises(ValueError, match="transpose"):
        compute_multidim_profile(rng.standard_normal((50, 3)), m=8)
    # ap16 config == running on the pre-quantized series
    from mpx.io.apfixed import quantize

    T = np.cumsum(rng.standard_normal((2, 220)), axis=1) * 0.01
    m = 16
    q = compute_multidim_profile(T, config=MatrixProfileConfig(
        m=m, dtype="ap16", band=32, chunk=64))
    e = compute_multidim_profile(quantize(T, "ap16"),
                                 config=MatrixProfileConfig(
                                     m=m, dtype="float32",
                                     band=32, chunk=64))
    np.testing.assert_array_equal(q.PMP, e.PMP)
    np.testing.assert_array_equal(q.PMPI, e.PMPI)


def test_multidim_motif_helper():
    rng = np.random.default_rng(47)
    d, n, m = 2, 240, 16
    T = np.cumsum(rng.standard_normal((d, n)), axis=1)
    # plant a 2-d motif
    pat = np.cumsum(rng.standard_normal((d, m)), axis=1)
    T[:, 30 : 30 + m] = pat
    T[:, 150 : 150 + m] = pat
    prof = compute_multidim_profile(T, config=MatrixProfileConfig(
        m=m, dtype="float64", band=32, chunk=64))
    i, j, dist = multidim_motif(prof, k=d)
    assert {i, j} == {30, 150}
    assert dist < 1e-6


def test_cli_mstamp(tmp_path, capsys):
    from mpx.cli import main
    from mpx.io.tsb import write_binary

    rng = np.random.default_rng(53)
    T = np.cumsum(rng.standard_normal((2, 300)), axis=1)
    paths = []
    for t in range(2):
        p = str(tmp_path / f"dim{t}.tsb")
        write_binary(p, T[t], "double")
        paths.append(p)
    out = str(tmp_path / "res")
    rc = main(["mstamp", "-i", paths[0], "-i", paths[1], "-m", "16",
               "-o", out, "--dtype", "float64"])
    assert rc == 0
    assert "k, best k-dimensional motif" in capsys.readouterr().out
    z = np.load(out + ".mstamp.npz")
    prof = compute_multidim_profile(T, config=MatrixProfileConfig(
        m=16, dtype="float64"))
    np.testing.assert_array_equal(z["PMP"], prof.PMP)
    np.testing.assert_array_equal(z["PMPI"], prof.PMPI)
    # unequal dimension lengths -> clean error
    short = str(tmp_path / "short.tsb")
    write_binary(short, T[0, :200], "double")
    assert main(["mstamp", "-i", paths[0], "-i", short, "-m", "16"]) == 1


def test_mstamp_sharded_matches_single_device():
    # Job-sharded mSTAMP over the virtual mesh == single-device result
    # (indices may differ only on equidistant ties).
    rng = np.random.default_rng(59)
    d, n, m = 3, 260, 16
    T = np.cumsum(rng.standard_normal((d, n)), axis=1)
    one = compute_multidim_profile(T, config=MatrixProfileConfig(
        m=m, dtype="float32", band=32, chunk=64))
    shd = compute_multidim_profile(T, config=MatrixProfileConfig(
        m=m, dtype="float32", band=32, chunk=64, num_shards=4))
    np.testing.assert_array_equal(shd.PMP, one.PMP)
    mism = shd.PMPI != one.PMPI
    assert np.array_equal(shd.PMP[mism], one.PMP[mism])


def test_mstamp_include_dims():
    rng = np.random.default_rng(61)
    d, n, m = 4, 200, 16
    T = np.cumsum(rng.standard_normal((d, n)), axis=1)
    prof = compute_multidim_profile(T, include=[2], config=MatrixProfileConfig(
        m=m, dtype="float64", band=32, chunk=64))
    P, I = mstamp_oracle(T, m, include=(2,))
    assert_multiprofile_close(prof, P, I, 1e-8)
    # include=all dims == unconstrained with a fixed front group
    with pytest.raises(ValueError, match="out of range"):
        compute_multidim_profile(T, include=[5], config=MatrixProfileConfig(
            m=m, dtype="float64", band=32, chunk=64))


def test_mstamp_discords_mode():
    from mpx.mstamp import multidim_discord

    rng = np.random.default_rng(67)
    d, n, m = 3, 220, 16
    T = np.cumsum(rng.standard_normal((d, n)), axis=1)
    # plant an anomaly across all dims
    T[:, 110 : 110 + m] += rng.standard_normal((d, m)) * 12
    prof = compute_multidim_profile(T, discords=True,
                                    config=MatrixProfileConfig(
                                        m=m, dtype="float64",
                                        band=32, chunk=64))
    P, I = mstamp_oracle(T, m, discords=True)
    assert_multiprofile_close(prof, P, I, 1e-8)
    i, dist = multidim_discord(prof, k=d)
    assert abs(i - 110) < m  # the planted anomaly is the top discord


def test_mstamp_validates_every_dimension():
    # Regression: NaN in a non-zero dimension silently poisoned results
    # instead of raising like dimension 0.
    rng = np.random.default_rng(137)
    T = np.cumsum(rng.standard_normal((2, 120)), axis=1)
    T[1, 60] = np.nan
    with pytest.raises(ValueError, match="non-finite"):
        compute_multidim_profile(T, config=MatrixProfileConfig(
            m=16, band=32, chunk=64))


def test_motif_helpers_reject_all_inf_profile():
    from mpx.mstamp import multidim_discord

    rng = np.random.default_rng(139)
    T = np.stack([np.cumsum(rng.standard_normal(150)), np.zeros(150)])
    prof = compute_multidim_profile(T, config=MatrixProfileConfig(
        m=16, dtype="float64", band=32, chunk=64))
    with pytest.raises(ValueError, match="no valid pairs"):
        multidim_motif(prof, k=2)
    dprof = compute_multidim_profile(T, discords=True,
                                     config=MatrixProfileConfig(
                                         m=16, dtype="float64",
                                         band=32, chunk=64))
    with pytest.raises(ValueError, match="no valid pairs"):
        multidim_discord(dprof, k=2)


def test_multidim_subspace():
    """The returned k-subset's mean per-dim distance equals the k-dim
    profile value at the motif, and planted dimensions are recovered."""
    from mpx.mstamp import multidim_subspace

    rng = np.random.default_rng(41)
    d, n, m = 4, 500, 32
    T = rng.standard_normal((d, n))
    pat = np.cumsum(rng.standard_normal(m))
    pat = (pat - pat.mean()) / pat.std() * 3
    # plant the motif in dims 1 and 3 only
    for t in (1, 3):
        T[t, 50:50 + m] += pat
        T[t, 300:300 + m] += pat
    cfg = MatrixProfileConfig(m=m, dtype="float64", band=64, chunk=64,
                              tile_rows=8, tile_cols=64)
    prof = compute_multidim_profile(T, config=cfg)
    i, j, dist = multidim_motif(prof, k=2)
    dims = multidim_subspace(T, m, i, j, k=2)
    assert set(dims.tolist()) == {1, 3}
    # subset mean reproduces the profile value exactly
    per = []
    for t in dims:
        a, b = T[t, i:i + m], T[t, j:j + m]
        ca, cb = a - a.mean(), b - b.mean()
        p = (ca @ cb) / np.sqrt((ca @ ca) * (cb @ cb))
        per.append(np.sqrt(2 * m * (1 - min(1.0, p))))
    assert abs(np.mean(per) - dist) < 1e-6
    # include pinning forces a dimension into the subset
    dims_inc = multidim_subspace(T, m, i, j, k=2, include=[0])
    assert dims_inc[0] == 0 and len(dims_inc) == 2
    # validation
    with pytest.raises(ValueError, match="out of range"):
        multidim_subspace(T, m, n, 0, k=2)
    with pytest.raises(ValueError, match="k="):
        multidim_subspace(T, m, i, j, k=9)


def test_subspace_include_larger_than_k_and_flat_dim():
    from mpx.mstamp import multidim_subspace

    rng = np.random.default_rng(43)
    T = rng.standard_normal((3, 200))
    T[1] = 1e6 + 1e-5 * rng.standard_normal(200)  # numerically flat
    # include larger than k takes the k closest include dims (device rule)
    dims = multidim_subspace(T, 16, 10, 100, k=1, include=[0, 2])
    assert dims.shape == (1,) and dims[0] in (0, 2)
    # the numerically-flat dimension (masked by the kernels' relative
    # clamp) never enters a subspace
    dims3 = multidim_subspace(T, 16, 10, 100, k=3)
    assert 1 == dims3[-1] or 1 not in dims3[:2]
    dims2 = multidim_subspace(T, 16, 10, 100, k=2)
    assert 1 not in dims2


def test_mdl_picks_planted_dimensionality():
    from mpx.mstamp import multidim_mdl

    rng = np.random.default_rng(9)
    d, n, m = 5, 600, 32
    T = np.cumsum(rng.standard_normal((d, n)), axis=1)
    pat0 = np.sin(np.linspace(0, 4 * np.pi, m)) * 4
    pat1 = np.cos(np.linspace(0, 6 * np.pi, m)) * 4
    for pos in (100, 400):
        T[0, pos : pos + m] = pat0 + 0.01 * rng.standard_normal(m)
        T[1, pos : pos + m] = pat1 + 0.01 * rng.standard_normal(m)
    res = multidim_mdl(T, m)
    assert res.best_k == 2
    assert set(res.subspaces[1].tolist()) == {0, 1}
    assert res.bitsaves.shape == (d,)
    # the planted-pair save dominates its neighbors
    assert res.bitsaves[1] > res.bitsaves[0]
    assert res.bitsaves[1] > res.bitsaves[3]


def test_mdl_reuses_profile_and_validates():
    from mpx.mstamp import compute_multidim_profile, multidim_mdl
    import pytest

    rng = np.random.default_rng(10)
    T = np.cumsum(rng.standard_normal((3, 300)), axis=1)
    prof = compute_multidim_profile(T, 16)
    res = multidim_mdl(T, 16, profile=prof)
    assert 1 <= res.best_k <= 3
    assert len(res.motifs) == 3 and res.motifs[res.best_k - 1] is not None
    with pytest.raises(ValueError, match="bits"):
        multidim_mdl(T, 16, profile=prof, bits=0)
    with pytest.raises(ValueError, match="rows"):
        multidim_mdl(T[:2], 16, profile=prof)


def test_mdl_flat_dimension_penalized():
    from mpx.mstamp import multidim_mdl

    rng = np.random.default_rng(11)
    T = np.cumsum(rng.standard_normal((3, 300)), axis=1)
    T[2] = 5.0  # flat dimension: can never justify itself
    res = multidim_mdl(T, 16)
    assert res.best_k <= 2


def test_net_sort_matches_jnp_sort():
    """The comparator-network sort is a correct sort for every small d
    (0-1 principle checked exhaustively) and matches jnp.sort on random
    lanes with +inf masking, both directions."""
    import itertools

    from mpx.mstamp import _net_sort, _network_pairs

    for n in range(1, 9):
        pairs = _network_pairs(n)
        for bits in itertools.product([0, 1], repeat=n):
            a = list(bits)
            for i, j in pairs:
                if a[i] > a[j]:
                    a[i], a[j] = a[j], a[i]
            assert a == sorted(bits), (n, bits)

    rng = np.random.default_rng(3)
    for d in (2, 4, 5, 8):
        x = rng.normal(size=(d, 7, 11)).astype(np.float32)
        x[x > 1.2] = np.inf  # masked pairs sort last, like the kernel's
        xs = jnp.asarray(x)
        np.testing.assert_array_equal(
            np.asarray(_net_sort(xs, False)), np.sort(x, axis=0)
        )
        np.testing.assert_array_equal(
            np.asarray(_net_sort(xs, True)), np.sort(x, axis=0)[::-1]
        )
