"""CLI: compute / tsbin / golden / datasets subcommands."""

import numpy as np
import pytest

from mpx.cli import main
from mpx.io.tsb import read_binary, write_ascii, write_binary
from mpx.reference import compute_matrix_profile_reference
from tests.conftest import random_walk


def test_version(capsys):
    assert main(["--version"]) == 0
    assert "mpx" in capsys.readouterr().out


def test_compute_roundtrip(tmp_path):
    T = random_walk(300, seed=21)
    inp = str(tmp_path / "ts.tsb")
    write_binary(inp, T, "double")
    out = str(tmp_path / "result")
    rc = main([
        "compute", "-i", inp, "-o", out, "-m", "16",
        "--dtype", "double", "--kernel", "xla",
        "--band", "64", "--chunk", "64",
        "--tile-rows", "8", "--tile-cols", "8", "--verbose",
    ])
    assert rc == 0
    MP = read_binary(out + ".mpb", "double")
    MPI = read_binary(out + ".mpib", "int")
    MP_exp, MPI_exp = compute_matrix_profile_reference(T, 16)
    np.testing.assert_allclose(MP, MP_exp, atol=1e-8)
    assert MP.shape == MPI.shape == (300 - 16 + 1,)


def test_tsbin_encode_decode(tmp_path, capsys):
    write_ascii(str(tmp_path / "x.txt"), [1.0, 2.0, 3.0, 4.0])
    assert main([
        "tsbin", "-e", str(tmp_path / "x.txt"),
        "-o", str(tmp_path / "x.tsb"), "-t", "double",
    ]) == 0
    np.testing.assert_array_equal(
        read_binary(str(tmp_path / "x.tsb"), "double"), [1, 2, 3, 4]
    )
    capsys.readouterr()  # drop the encode log line
    # decode with offset/limit
    assert main([
        "tsbin", "-d", str(tmp_path / "x.tsb"), "--offset", "1", "-l", "2",
    ]) == 0
    out = capsys.readouterr().out
    assert out.strip().splitlines() == ["2.0", "3.0"]
    # an explicit --limit 0 emits zero elements (not the whole file)
    assert main(["tsbin", "-d", str(tmp_path / "x.tsb"), "-l", "0"]) == 0
    assert capsys.readouterr().out.strip() == ""


def test_compute_rejects_unsupported_flag_combos(tmp_path):
    import pytest

    from mpx.io.tsb import write_binary

    write_binary(str(tmp_path / "t.tsb"), random_walk(64, seed=1), "double")
    with pytest.raises(SystemExit):
        main(["compute", "-i", str(tmp_path / "t.tsb"), "-m", "8",
              "--left-right", "--checkpoint", str(tmp_path / "c.npz")])
    with pytest.raises(SystemExit):
        main(["compute", "-i", str(tmp_path / "t.tsb"), "-m", "8",
              "--checkpoint", str(tmp_path / "c.npz"), "--shards", "2"])


def test_golden_subcommand(tmp_path):
    T = random_walk(128, seed=3)
    write_binary(str(tmp_path / "g.tsb"), T, "double")
    assert main([
        "golden", "-i", str(tmp_path / "g.tsb"),
        "-o", str(tmp_path / "gold"), "-m", "16",
    ]) == 0
    MP = read_binary(str(tmp_path / "gold.mpb"), "double")
    MP_exp, _ = compute_matrix_profile_reference(T, 16)
    np.testing.assert_allclose(MP, MP_exp, atol=0)


def test_datasets_subcommand(capsys):
    assert main(["datasets"]) == 0
    out = capsys.readouterr().out
    assert "test:" in out and "1024.txt" in out


def test_checkpoint_resume(tmp_path):
    from mpx.checkpoint import compute_with_checkpoint, _load, _fingerprint
    from mpx.config import MatrixProfileConfig

    T = random_walk(400, seed=17)
    cfg = MatrixProfileConfig(m=16, dtype="float64", kernel="xla",
                              band=32, chunk=64, tile_rows=8, tile_cols=8)
    ckpt = str(tmp_path / "state.npz")
    MP1, MPI1 = compute_with_checkpoint(T, cfg, ckpt, group_jobs=4,
                                        keep_checkpoint=True)
    # checkpoint exists and is complete; a resume must be a no-op
    assert _load(ckpt, _fingerprint(np.asarray(T), cfg.shrink_to(400 - 16 + 1),
                                    400 - 16 + 1, 4, "xla")) is not None
    # a fingerprint for a different kernel must NOT match (resume would
    # merge aggregates from mixed backends)
    assert _load(ckpt, _fingerprint(np.asarray(T), cfg.shrink_to(400 - 16 + 1),
                                    400 - 16 + 1, 4, "mxu")) is None
    MP2, MPI2 = compute_with_checkpoint(T, cfg, ckpt, group_jobs=4)
    np.testing.assert_array_equal(MP1, MP2)
    np.testing.assert_array_equal(MPI1, MPI2)

    from mpx.reference import compute_matrix_profile_reference

    MP_exp, MPI_exp = compute_matrix_profile_reference(T, 16)
    np.testing.assert_allclose(MP1, MP_exp, atol=1e-8)


def test_analyze_subcommand(tmp_path, capsys):
    import numpy as np

    rng = np.random.default_rng(6)
    T = rng.standard_normal(512) * 0.05
    motif = np.sin(np.linspace(0, 4 * np.pi, 64))
    T[50:114] += motif
    T[400:464] += motif
    from mpx.io.tsb import write_binary

    write_binary(str(tmp_path / "a.tsb"), T, "double")
    assert main([
        "analyze", "-i", str(tmp_path / "a.tsb"), "-m", "64", "-k", "1",
        "--kernel", "mxu", "--dtype", "float64",
    ]) == 0
    out = capsys.readouterr().out
    assert "motifs" in out and "discords" in out
    line = out.splitlines()[1].split()
    a, b = int(line[0]), int(line[1])
    assert abs(a - 50) <= 10 and abs(b - 400) <= 10


def test_abjoin_subcommand(tmp_path):
    import numpy as np

    from mpx.io.tsb import read_binary, write_binary

    A = random_walk(256, seed=31)
    B = random_walk(300, seed=32)
    write_binary(str(tmp_path / "A.tsb"), A, "double")
    write_binary(str(tmp_path / "B.tsb"), B, "double")
    assert main([
        "abjoin", "-a", str(tmp_path / "A.tsb"), "-b", str(tmp_path / "B.tsb"),
        "-m", "16", "--dtype", "double", "--band", "64", "--chunk", "64",
        "-o", str(tmp_path / "res"),
    ]) == 0
    mpa = read_binary(str(tmp_path / "res.a.mpb"), "double")
    from mpx.abjoin import brute_force_ab_join

    exp = brute_force_ab_join(A, B, 16)[0]
    np.testing.assert_allclose(mpa, exp, atol=1e-8)


def test_compute_left_right_flag(tmp_path):
    import numpy as np

    from mpx.io.tsb import read_binary, write_binary

    T = random_walk(300, seed=61)
    write_binary(str(tmp_path / "t.tsb"), T, "double")
    assert main([
        "compute", "-i", str(tmp_path / "t.tsb"), "-m", "16",
        "--dtype", "double", "--band", "64", "--chunk", "64",
        "--left-right", "-o", str(tmp_path / "lr"),
    ]) == 0
    mpl = read_binary(str(tmp_path / "lr.left.mpb"), "double")
    mpr = read_binary(str(tmp_path / "lr.right.mpb"), "double")
    mpli = read_binary(str(tmp_path / "lr.left.mpib"), "int")
    assert mpl.shape == mpr.shape == (300 - 16 + 1,)
    # left neighbors are strictly earlier
    rows = np.arange(mpl.shape[0])
    valid = mpli >= 0
    assert np.all(mpli[valid] < rows[valid])


def test_topk_subcommand(tmp_path):
    import numpy as np

    from mpx.io.tsb import write_binary

    T = random_walk(256, seed=71)
    write_binary(str(tmp_path / "t.tsb"), T, "double")
    assert main([
        "topk", "-i", str(tmp_path / "t.tsb"), "-m", "16", "-k", "3",
        "--dtype", "double", "--band", "64", "--chunk", "64",
        "-o", str(tmp_path / "nn"),
    ]) == 0
    data = np.load(str(tmp_path / "nn.topk.npz"))
    assert data["distances"].shape == (256 - 16 + 1, 3)
    assert np.all(np.diff(data["distances"], axis=1) >= -1e-9)


def test_analyze_chain_flag(tmp_path, capsys):
    import numpy as np

    T = random_walk(512, seed=41)
    from mpx.io.tsb import write_binary

    write_binary(str(tmp_path / "c.tsb"), T, "double")
    assert main([
        "analyze", "-i", str(tmp_path / "c.tsb"), "-m", "16", "-k", "1",
        "--chain", "--kernel", "mxu", "--dtype", "float64",
    ]) == 0
    out = capsys.readouterr().out
    assert "unanchored chain" in out


def test_abjoin_mpdist_flag(tmp_path, capsys):
    import numpy as np

    from mpx.io.tsb import write_binary

    A = random_walk(256, seed=31)
    B = A[40:200].copy()
    write_binary(str(tmp_path / "A.tsb"), A, "double")
    write_binary(str(tmp_path / "B.tsb"), B, "double")
    assert main([
        "abjoin", "-a", str(tmp_path / "A.tsb"), "-b", str(tmp_path / "B.tsb"),
        "-m", "16", "--dtype", "double", "--band", "64", "--chunk", "64",
        "--mpdist", "-o", str(tmp_path / "r"),
    ]) == 0
    out = capsys.readouterr().out
    assert "MPdist:" in out
    d = float(out.split("MPdist:")[1].split()[0])
    # B is a verbatim slice of A: the 5th-percentile ABBA distance ~ 0
    assert d < 1e-4


def test_analyze_av_flag(tmp_path, capsys):
    """Guided search: the complexity AV suppresses flat-region motifs."""
    rng = np.random.default_rng(51)
    # flat region with a tiny repeated wiggle (would win unguided) plus
    # a high-complexity repeated pattern
    T = 0.02 * rng.standard_normal(600)
    pat = np.cumsum(rng.standard_normal(32))
    pat = (pat - pat.mean()) / pat.std()
    T[100:132] += pat
    T[400:432] += pat
    inp = str(tmp_path / "av.tsb")
    write_binary(inp, T, "double")
    assert main(["analyze", "-i", inp, "-m", "32", "-k", "1",
                 "--av", "complexity", "--dtype", "double"]) == 0
    out = capsys.readouterr().out
    assert "annotation vector: complexity" in out
    a, b = out.split("motifs (a, b, distance):")[1].split()[:2]
    assert abs(int(a) - 100) <= 8 and abs(int(b) - 400) <= 8
    # --av with saved results is rejected (needs the series)
    from mpx.io.tsb import write_binary as wb
    res = str(tmp_path / "res")
    assert main(["compute", "-i", inp, "-m", "32", "-o", res]) == 0
    with pytest.raises(SystemExit):
        main(["analyze", "-i", res, "-m", "32", "--av", "complexity"])


def test_chains_subcommand(tmp_path, capsys):
    from mpx.io.tsb import write_binary
    from tests.test_chains import drifting_series

    T, starts = drifting_series()
    write_binary(str(tmp_path / "d.tsb"), T, "double")
    assert main([
        "chains", "-i", str(tmp_path / "d.tsb"), "-m", "32",
        "--dtype", "float64", "--all",
    ]) == 0
    out = capsys.readouterr().out
    assert "longest unanchored" in out and "->" in out
    capsys.readouterr()
    assert main([
        "chains", "-i", str(tmp_path / "d.tsb"), "-m", "32",
        "--dtype", "float64", "--anchor", str(starts[0]),
    ]) == 0
    assert f"anchored @ {starts[0]}" in capsys.readouterr().out


def test_thresh_subcommand(tmp_path, capsys):
    from mpx.io.tsb import write_binary

    T = random_walk(512, seed=9)
    write_binary(str(tmp_path / "t.tsb"), T, "double")
    assert main([
        "thresh", "-i", str(tmp_path / "t.tsb"), "-m", "16",
        "--threshold", "0.5", "--dtype", "float64",
        "-o", str(tmp_path / "r"),
    ]) == 0
    out = capsys.readouterr().out
    assert "densest windows" in out
    import numpy as np

    data = np.load(str(tmp_path / "r.thresh.npz"))
    from mpx.thresh import brute_force_sum_thresh

    esums, ecnts = brute_force_sum_thresh(T, 16, 0.5)
    np.testing.assert_allclose(data["sums"], esums, atol=1e-8)
    np.testing.assert_array_equal(data["counts"], ecnts)


def test_motiflets_subcommand(tmp_path, capsys):
    from mpx.io.tsb import write_binary
    from tests.test_motiflets import planted

    T, starts = planted()
    write_binary(str(tmp_path / "mf.tsb"), T, "double")
    assert main([
        "motiflets", "-i", str(tmp_path / "mf.tsb"), "-m", "48",
        "-k", "5", "--dtype", "float64",
    ]) == 0
    out = capsys.readouterr().out
    assert "5-motiflet" in out and "occurrences:" in out
    assert main([
        "motiflets", "-i", str(tmp_path / "mf.tsb"), "-m", "48",
        "--elbows", "7", "--dtype", "float64",
    ]) == 0
    out = capsys.readouterr().out
    assert "elbows" in out and "k=5" in out
    # neither -k nor --elbows
    assert main([
        "motiflets", "-i", str(tmp_path / "mf.tsb"), "-m", "48",
    ]) == 1


def test_damp_subcommand(tmp_path, capsys):
    import numpy as np

    from mpx.io.tsb import write_binary
    from tests.test_damp import with_anomaly

    T = with_anomaly()
    write_binary(str(tmp_path / "an.tsb"), T, "double")
    assert main([
        "damp", "-i", str(tmp_path / "an.tsb"), "-m", "32",
        "--split", "100", "-k", "2", "--dtype", "float64",
        "-o", str(tmp_path / "sc"),
    ]) == 0
    out = capsys.readouterr().out
    assert "anomalies" in out
    top = int(out.splitlines()[2].split()[0])
    assert abs(top - 700) <= 32
    scores = np.load(str(tmp_path / "sc.damp.npy"))
    from tests.test_left_right import brute_force_left_right

    bl, _, _, _ = brute_force_left_right(T, 32)
    fin = np.isfinite(bl)
    np.testing.assert_allclose(scores[fin], bl[fin], atol=1e-8)
