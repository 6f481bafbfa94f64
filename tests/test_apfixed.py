"""Fixed-point (ap_fixed) input tier: quantization semantics vs the
reference's FileIO double->ap cast (include/host/FileIO.hpp:50-103,
include/ArbitraryPrecisionFixed.hpp:18-37), container round-trips, and
end-to-end routing through MatrixProfileConfig."""

import numpy as np
import pytest

from mpx.config import MatrixProfileConfig
from mpx.io.apfixed import (
    FORMATS,
    check_range,
    from_raw,
    get_format,
    is_quantized_file,
    quantization_error_bound,
    quantize,
    read_quantized,
    to_raw,
    write_quantized,
)


def test_format_geometry_matches_reference():
    # ArbitraryPrecisionFixed.hpp:18-37: <W, I> pairs and safe ranges.
    assert (FORMATS["ap16"].width, FORMATS["ap16"].integer) == (16, 5)
    assert (FORMATS["ap24"].width, FORMATS["ap24"].integer) == (24, 8)
    assert (FORMATS["ap32"].width, FORMATS["ap32"].integer) == (32, 11)
    assert (FORMATS["ap64"].width, FORMATS["ap64"].integer) == (64, 14)
    # FileIO.hpp:50-65 integral "safe-range" bounds.
    assert (FORMATS["ap16"].min_value, FORMATS["ap16"].max_value) == (-16.0, 15.0)
    assert (FORMATS["ap32"].min_value, FORMATS["ap32"].max_value) == (-1024.0, 1023.0)
    assert FORMATS["ap64"].fraction == 50


def test_quantize_rounds_toward_zero():
    # AP_RND_ZERO: truncate toward zero for BOTH signs.
    x = np.array([1.23456789, -1.23456789, 0.999999, -0.999999])
    q = quantize(x, "ap16")
    s = 2.0 ** 11
    expect = np.trunc(x * s) / s
    np.testing.assert_array_equal(q, expect)
    assert q[0] <= x[0] and q[1] >= x[1]  # toward zero
    # Error bounded by one fraction ulp.
    assert np.max(np.abs(q - x)) < quantization_error_bound("ap16")


@pytest.mark.parametrize("name", list(FORMATS))
def test_quantize_idempotent_and_exact(name):
    rng = np.random.default_rng(3)
    x = rng.standard_normal(1000) * 3.0
    q = quantize(x, name)
    # On-grid values are fixed points of the cast.
    np.testing.assert_array_equal(quantize(q, name), q)
    # Mantissa round-trip is exact (module docstring's f64 argument).
    np.testing.assert_array_equal(from_raw(to_raw(x, name), name), q)


def test_ap64_large_values_already_on_grid():
    # ulp(x) >= 2^-50 for |x| >= 4: the cast must be the identity.
    x = np.array([4.000000000000001, -8191.999999999999, 13.7])
    np.testing.assert_array_equal(quantize(x, "ap64"), x)


def test_range_check_matches_fileio():
    # FileIO.hpp:92-99: reject values outside the integral safe range.
    quantize(np.array([15.0, -16.0]), "ap16")  # boundary values pass
    with pytest.raises(ValueError, match="safe-range"):
        quantize(np.array([0.0, 15.5]), "ap16")
    with pytest.raises(ValueError, match="safe-range"):
        check_range(np.array([-16.001]), get_format("ap16"))
    with pytest.raises(ValueError, match="safe-range"):
        check_range(np.array([np.nan]), get_format("ap24"))
    # check=False skips it (quantization then wraps like AP_WRAP_SM
    # would NOT — we simply truncate; out-of-range storage is on the
    # caller, matching the reference's #if _io_chk_ap_range gate).
    quantize(np.array([15.5]), "ap16", check=False)


def test_unknown_format_rejected():
    with pytest.raises(ValueError, match="ap_fixed format"):
        get_format("ap8")


@pytest.mark.parametrize("name", list(FORMATS))
def test_container_roundtrip(tmp_path, name):
    rng = np.random.default_rng(7)
    x = rng.standard_normal(311) * 2.0
    p = str(tmp_path / f"x.{name}.tsb")
    write_quantized(p, x, name)
    assert is_quantized_file(p)
    back = read_quantized(p, n=311)
    np.testing.assert_array_equal(back, quantize(x, name))
    # Strict size checks (FileIO.hpp:38-47 analog).
    with pytest.raises(ValueError, match="unexpected number"):
        read_quantized(p, n=312)


def test_container_detects_truncation(tmp_path):
    x = np.linspace(-1, 1, 64)
    p = str(tmp_path / "x.q")
    write_quantized(p, x, "ap24")
    with open(p, "r+b") as f:
        f.truncate(100)
    with pytest.raises(ValueError, match="payload"):
        read_quantized(p)


def test_read_series_autodetects_mpxq(tmp_path):
    from mpx.io.tsb import read_series

    x = np.sin(np.linspace(0, 20, 500))
    p = str(tmp_path / "wave.tsb")  # .tsb extension, MPXQ payload
    write_quantized(p, x, "ap16")
    np.testing.assert_array_equal(read_series(p), quantize(x, "ap16"))


def test_config_maps_ap_dtypes():
    c16 = MatrixProfileConfig(m=32, dtype="ap16")
    assert c16.dtype == "float32" and c16.input_quant == "ap16"
    c24 = MatrixProfileConfig(m=32, dtype="ap24")
    assert c24.dtype == "float32" and c24.input_quant == "ap24"
    c32 = MatrixProfileConfig(m=32, dtype="ap32")
    assert c32.dtype == "float64" and c32.input_quant == "ap32"
    c64 = MatrixProfileConfig(m=32, dtype="ap64")
    assert c64.dtype == "float64" and c64.input_quant == "ap64"
    # Explicit matching input_quant is fine; a conflict is not.
    MatrixProfileConfig(m=32, dtype="ap16", input_quant="ap16")
    with pytest.raises(ValueError, match="conflicts"):
        MatrixProfileConfig(m=32, dtype="ap16", input_quant="ap24")
    with pytest.raises(ValueError, match="ap_fixed format"):
        MatrixProfileConfig(m=32, dtype="float32", input_quant="ap9")


def test_end_to_end_equals_prequantized_run():
    from mpx.driver import compute_matrix_profile

    rng = np.random.default_rng(11)
    T = np.cumsum(rng.standard_normal(600)) * 0.01  # stays in ap16 range
    MPq, MPIq = compute_matrix_profile(
        T, config=MatrixProfileConfig(m=24, dtype="ap16"))
    MPe, MPIe = compute_matrix_profile(
        quantize(T, "ap16"), config=MatrixProfileConfig(m=24, dtype="float32"))
    np.testing.assert_array_equal(np.asarray(MPq), np.asarray(MPe))
    np.testing.assert_array_equal(np.asarray(MPIq), np.asarray(MPIe))


def test_end_to_end_ap32_matches_golden_on_quantized_input():
    from mpx.driver import compute_matrix_profile
    from mpx.reference import compute_matrix_profile_reference as golden
    from tests.helpers import assert_profile_close

    rng = np.random.default_rng(13)
    T = np.cumsum(rng.standard_normal(400)) * 0.02
    m = 16
    Tq = quantize(T, "ap32")
    MP, MPI = compute_matrix_profile(
        T, config=MatrixProfileConfig(m=m, dtype="ap32"))
    gMP, gMPI = golden(Tq, m)
    assert_profile_close(Tq, m, np.asarray(MP), np.asarray(MPI),
                         gMP, gMPI, eps=1e-8)


def test_abjoin_and_topk_honor_input_quant():
    from mpx.abjoin import compute_ab_join
    from mpx.topk import compute_topk_profile

    rng = np.random.default_rng(17)
    A = np.cumsum(rng.standard_normal(300)) * 0.02
    B = np.cumsum(rng.standard_normal(260)) * 0.02
    cfgq = MatrixProfileConfig(m=20, dtype="ap24")
    cfge = MatrixProfileConfig(m=20, dtype="float32")
    rq = compute_ab_join(A, B, config=cfgq)
    re_ = compute_ab_join(quantize(A, "ap24"), quantize(B, "ap24"), config=cfge)
    np.testing.assert_array_equal(np.asarray(rq.mp_a), np.asarray(re_.mp_a))
    np.testing.assert_array_equal(np.asarray(rq.mpi_a), np.asarray(re_.mpi_a))
    np.testing.assert_array_equal(np.asarray(rq.mp_b), np.asarray(re_.mp_b))

    Dq, Iq = compute_topk_profile(A, k=3, config=cfgq)
    De, Ie = compute_topk_profile(quantize(A, "ap24"), k=3, config=cfge)
    np.testing.assert_array_equal(np.asarray(Dq), np.asarray(De))
    np.testing.assert_array_equal(np.asarray(Iq), np.asarray(Ie))


def test_cli_tsbin_ap_roundtrip(tmp_path):
    from mpx.cli import main

    x = np.round(np.sin(np.linspace(0, 6, 97)), 6)
    src = tmp_path / "x.txt"
    src.write_text("\n".join(repr(float(v)) for v in x) + "\n")
    enc = str(tmp_path / "x.ap16")
    assert main(["tsbin", "-e", str(src), "-o", enc, "-t", "ap16"]) == 0
    dec = str(tmp_path / "x.out.txt")
    assert main(["tsbin", "-d", enc, "-o", dec, "-t", "ap16"]) == 0
    from mpx.io.tsb import read_ascii

    np.testing.assert_array_equal(read_ascii(dec), quantize(x, "ap16"))
    # The quantized container is 4x smaller than the double .tsb.
    import os

    dbl = str(tmp_path / "x.tsb")
    assert main(["tsbin", "-e", str(src), "-o", dbl, "-t", "double"]) == 0
    assert os.path.getsize(enc) < os.path.getsize(dbl) / 3


def test_checkpoint_path_honors_input_quant(tmp_path):
    # Regression: compute_with_checkpoint skipped the FileIO cast, so a
    # checkpointed ap run silently computed on the unquantized series.
    from mpx.checkpoint import compute_with_checkpoint
    from mpx.driver import compute_matrix_profile

    rng = np.random.default_rng(19)
    T = np.cumsum(rng.standard_normal(400)) * 0.02
    cfg = MatrixProfileConfig(m=16, dtype="ap32", band=64, chunk=64)
    ckpt = str(tmp_path / "st.npz")
    MPc, MPIc = compute_with_checkpoint(T, cfg, ckpt, group_jobs=4)
    MPd, MPId = compute_matrix_profile(T, config=cfg)
    np.testing.assert_allclose(np.asarray(MPc), np.asarray(MPd),
                               rtol=0, atol=1e-12)
    np.testing.assert_array_equal(np.asarray(MPIc), np.asarray(MPId))


def test_fused_pan_honors_input_quant():
    # Regression: the fused pan path passed the raw series to
    # run_pan_jobs while the exact path quantized per-m.
    from mpx.pan import compute_pan_profile

    rng = np.random.default_rng(23)
    T = np.cumsum(rng.standard_normal(512)) * 0.01
    ms = [16, 32]
    cfg = MatrixProfileConfig(m=16, dtype="ap16", band=64, chunk=64)
    pan_q = compute_pan_profile(T, ms, config=cfg, method="fused")
    pan_e = compute_pan_profile(quantize(T, "ap16"), ms,
                                config=MatrixProfileConfig(
                                    m=16, dtype="float32",
                                    band=64, chunk=64),
                                method="fused")
    np.testing.assert_array_equal(pan_q.PMP, pan_e.PMP)
    np.testing.assert_array_equal(pan_q.PMPI, pan_e.PMPI)
