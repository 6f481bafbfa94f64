"""Pallas TPU kernel in interpret mode (the sw_emu analog) vs the XLA
kernel and the golden reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from mpx import MatrixProfileConfig, compute_matrix_profile
from mpx.dtypes import distance_epsilon
from mpx.kernels import band_geometry
from mpx.kernels.pallas_tpu import sweep_band_pallas
from mpx.kernels.xla import sweep_band_xla
from mpx.ops.precompute import precompute_statistics
from mpx.reference import compute_matrix_profile_reference
from tests.conftest import random_walk
from tests.helpers import assert_profile_close


@pytest.mark.parametrize(
    "r0,k0",
    [(0, 0), (16, 0), (0, 32), (48, 32)],
)
def test_band_sweep_matches_xla(r0, k0):
    n, m = 256, 16
    S, W, tr, tc = 16, 32, 8, 16
    w = n - m + 1
    T = random_walk(n, seed=99)
    stats = precompute_statistics(T, m, band=S, chunk=W, dtype="float32")
    geom = band_geometry(S, W, m, w, tr, tc)

    ref = sweep_band_xla(stats, jnp.int32(r0), jnp.int32(k0), geom, jnp.float32)
    got = sweep_band_pallas(
        stats, jnp.int32(r0), jnp.int32(k0), geom, jnp.float32, interpret=True
    )

    for name in ("row", "col"):
        rv = np.asarray(getattr(ref, name).value)
        gv = np.asarray(getattr(got, name).value)
        np.testing.assert_allclose(gv, rv, atol=1e-4, err_msg=f"{name} values")
        ri = np.asarray(getattr(ref, name).index)
        gi = np.asarray(getattr(got, name).index)
        # indices may differ only where values tie; check via values
        diff = ri != gi
        assert np.all(np.abs(rv[diff] - gv[diff]) <= 1e-4), f"{name} indices"


@pytest.mark.parametrize("n,m,band,chunk", [(256, 16, 32, 64), (512, 16, 64, 128)])
def test_pallas_end_to_end_interpret(n, m, band, chunk):
    T = random_walk(n, seed=n)
    cfg = MatrixProfileConfig(
        m=m, dtype="float32", kernel="pallas", band=band, chunk=chunk,
        tile_rows=8, tile_cols=32, interpret=True,
    )
    MP, MPI = compute_matrix_profile(T, config=cfg)
    MP_exp, MPI_exp = compute_matrix_profile_reference(T, m)
    assert_profile_close(T, m, MP, MPI, MP_exp, MPI_exp,
                         eps=distance_epsilon("float32"))


def test_pallas_rejects_f64():
    T = random_walk(128, seed=0)
    stats = precompute_statistics(T, 16, band=16, chunk=32, dtype="float64")
    geom = band_geometry(16, 32, 16, 113, 8, 16)
    with pytest.raises(ValueError, match="float32-only"):
        sweep_band_pallas(stats, jnp.int32(0), jnp.int32(0), geom, jnp.float64)
