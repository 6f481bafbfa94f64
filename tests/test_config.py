"""Config validation (the CMakeLists.txt:54-94 analog)."""

import pytest

from mpx.config import MatrixProfileConfig
from mpx.dtypes import canonical_dtype


def test_rejects_bad_kernel():
    with pytest.raises(ValueError, match="kernel"):
        MatrixProfileConfig(kernel="vanilla")


def test_rejects_small_m():
    with pytest.raises(ValueError, match="m must be"):
        MatrixProfileConfig(m=3)


def test_rejects_bad_dtype():
    with pytest.raises(ValueError, match="Unsupported data type"):
        MatrixProfileConfig(dtype="int8")
    with pytest.raises(ValueError):
        canonical_dtype("ap16")  # the reference's never-selectable ap_fixed


def test_accepts_reference_dtype_names():
    assert str(canonical_dtype("double")) == "float64"
    assert str(canonical_dtype("float")) == "float32"


def test_rejects_nondivisible_tiles():
    with pytest.raises(ValueError, match="multiple"):
        MatrixProfileConfig(band=100, tile_rows=8)


def test_tile_clamping():
    cfg = MatrixProfileConfig(band=64, chunk=64, tile_rows=512, tile_cols=4096)
    assert cfg.tile_rows == 64 and cfg.tile_cols == 64


def test_series_validation():
    cfg = MatrixProfileConfig(m=32)
    with pytest.raises(ValueError, match="must be >= m"):
        cfg.validate_series(16)
    with pytest.raises(ValueError, match="at least 2"):
        cfg.validate_series(32)


def test_shrink_to():
    cfg = MatrixProfileConfig(band=4096, chunk=16384, tile_rows=8, tile_cols=8)
    small = cfg.shrink_to(100)
    assert small.band <= 104 and small.chunk <= 104


def test_non_finite_input_rejected():
    """NaN/inf input would silently poison every correlation; the
    validator names the offending index (failure-detection subsystem)."""
    import numpy as np
    import pytest

    from mpx import MatrixProfileConfig, compute_matrix_profile

    T = np.ones(100)
    T[37] = np.nan
    with pytest.raises(ValueError, match="index 37"):
        compute_matrix_profile(T, config=MatrixProfileConfig(m=8))
    T[37] = np.inf
    with pytest.raises(ValueError, match="non-finite"):
        compute_matrix_profile(T, config=MatrixProfileConfig(m=8))
