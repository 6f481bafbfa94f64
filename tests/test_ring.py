"""Pod-scale ring sharding (mpx/parallel/ring.py): sharded inputs,
ppermute column rotation, balanced block-pair coverage."""

import numpy as np
import pytest

from mpx.parallel.ring import run_ring_sharded
from mpx.reference import compute_matrix_profile_reference
from tests.conftest import random_walk
from tests.helpers import assert_profile_close


@pytest.mark.parametrize("shards", [2, 4, 8])
def test_ring_matches_golden_even(shards):
    T = random_walk(3000, seed=51)
    m = 32
    MP, MPI = run_ring_sharded(T, m, num_shards=shards, band=128, chunk=128)
    MP_exp, MPI_exp = compute_matrix_profile_reference(T, m)
    assert_profile_close(T, m, MP, MPI, MP_exp, MPI_exp, eps=2e-3)


@pytest.mark.parametrize("shards", [3, 5])
def test_ring_matches_golden_odd(shards):
    """Odd rings have no antipodal step — different coverage predicate."""
    T = random_walk(1700, seed=52)
    m = 16
    MP, MPI = run_ring_sharded(T, m, num_shards=shards, band=64, chunk=64)
    MP_exp, MPI_exp = compute_matrix_profile_reference(T, m)
    assert_profile_close(T, m, MP, MPI, MP_exp, MPI_exp, eps=2e-3)


def test_ring_ragged_tail():
    """w not divisible by shards*band: the padded tail must stay inert."""
    T = random_walk(1234, seed=53)
    m = 16
    MP, MPI = run_ring_sharded(T, m, num_shards=4, band=64, chunk=64)
    MP_exp, MPI_exp = compute_matrix_profile_reference(T, m)
    assert MP.shape[0] == 1234 - 16 + 1
    assert_profile_close(T, m, MP, MPI, MP_exp, MPI_exp, eps=2e-3)


def test_ring_rejects_f64():
    with pytest.raises(NotImplementedError):
        run_ring_sharded(random_walk(600, seed=54), 16, num_shards=2,
                         dtype="float64")


def test_ring_unequal_band_chunk():
    """W > S exercises the rectangle-tiled diag grid (a diagonal-chunk
    grid would emit clamped out-of-shard column slices here)."""
    T = random_walk(3000, seed=55)
    m = 32
    MP, MPI = run_ring_sharded(T, m, num_shards=4, band=64, chunk=256)
    MP_exp, MPI_exp = compute_matrix_profile_reference(T, m)
    assert_profile_close(T, m, MP, MPI, MP_exp, MPI_exp, eps=2e-3)


@pytest.mark.parametrize("shards", [1, 3, 4, 8])
def test_ring_hybrid_f64_exact(shards):
    """The sharded-inputs double tier must match the golden f64 profile
    at the reference tolerance (1e-8), like the single-chip hybrid."""
    from mpx.parallel.ring import run_ring_hybrid_f64

    T = random_walk(2500, seed=56)
    m = 24
    MP, MPI = run_ring_hybrid_f64(T, m, num_shards=shards,
                                  band=64, chunk=128)
    MP_exp, MPI_exp = compute_matrix_profile_reference(T, m)
    assert_profile_close(T, m, MP, MPI, MP_exp, MPI_exp, eps=1e-8)


def test_ring_hybrid_f64_overflow_fallback():
    """A tiny flagged-slot budget forces the fused pass B to overflow
    on (nearly) every job, exercising the dense capture fallback; the
    result must stay exact."""
    from mpx.parallel.ring import run_ring_hybrid_f64

    T = random_walk(1500, seed=58)
    m = 16
    MP, MPI = run_ring_hybrid_f64(T, m, num_shards=2, band=64, chunk=64,
                                  suspect_f=2)
    MP_exp, MPI_exp = compute_matrix_profile_reference(T, m)
    assert_profile_close(T, m, MP, MPI, MP_exp, MPI_exp, eps=1e-8)


@pytest.mark.parametrize("shards", [1, 4])
def test_ring_hybrid_f64_fused_fallback_budget(monkeypatch, shards):
    """MPX_RING_CAPTURE_BUDGET=0 (the pod-scale geometry analog, where
    pass A's capture state exceeds HBM) must route pass B through the
    capture-free fused dense re-sweep and stay exact."""
    import importlib

    monkeypatch.setenv("MPX_RING_CAPTURE_BUDGET", "0")
    import mpx.parallel.ring as ring_mod

    importlib.reload(ring_mod)
    try:
        T = random_walk(1800, seed=59)
        m = 24
        MP, MPI = ring_mod.run_ring_hybrid_f64(T, m, num_shards=shards,
                                               band=64, chunk=128)
        MP_exp, MPI_exp = compute_matrix_profile_reference(T, m)
        assert_profile_close(T, m, MP, MPI, MP_exp, MPI_exp, eps=1e-8)
    finally:
        monkeypatch.delenv("MPX_RING_CAPTURE_BUDGET")
        importlib.reload(ring_mod)


def test_ring_hybrid_f64_driver_route():
    """float64 + shard_mode='ring' routes through the hybrid ring tier."""
    from mpx.config import MatrixProfileConfig
    from mpx.driver import compute_matrix_profile

    T = random_walk(1800, seed=57)
    m = 16
    cfg = MatrixProfileConfig(m=m, dtype="float64", band=64, chunk=64,
                              num_shards=4, shard_mode="ring")
    MP, MPI = compute_matrix_profile(T, config=cfg)
    MP_exp, MPI_exp = compute_matrix_profile_reference(T, m)
    assert MP.dtype == np.float64
    assert_profile_close(T, m, MP, MPI, MP_exp, MPI_exp, eps=1e-8)


def test_ring_single_device_routing():
    """shard_mode='ring' is honored on a 1-device mesh (how the tier is
    benchmarked on single-chip hardware) — with num_shards=1 or unset."""
    from mpx.config import MatrixProfileConfig
    from mpx.driver import compute_matrix_profile

    T = random_walk(1200, seed=61)
    m = 16
    MP_exp, MPI_exp = compute_matrix_profile_reference(T, m)
    for ns in (1, None):
        cfg = MatrixProfileConfig(m=m, dtype="float32", band=64, chunk=64,
                                  num_shards=ns, shard_mode="ring")
        MP, MPI = compute_matrix_profile(T, config=cfg)
        assert_profile_close(T, m, np.asarray(MP, np.float64), np.asarray(MPI),
                             MP_exp, MPI_exp, eps=2e-3)


def test_ring_f32_auto_routes_hybrid(monkeypatch):
    """Large-w float32 over sharded inputs rides the ring hybrid
    (exact f64 distances cast down), mirroring the jobs-mode f32
    routing — verified by f64-grade accuracy, far beyond the one-pass
    f32 tier's 2e-3 tolerance."""
    import mpx.kernels as kernels
    from mpx.config import MatrixProfileConfig
    from mpx.driver import compute_matrix_profile

    monkeypatch.setattr(kernels, "HYBRID32_MIN_W", 256)
    T = random_walk(1024, seed=5)
    m = 16
    cfg = MatrixProfileConfig(m=m, dtype="float32", shard_mode="ring",
                              num_shards=2, band=64, chunk=128,
                              tile_rows=8, tile_cols=64)
    MP, MPI = compute_matrix_profile(T, config=cfg)
    assert np.asarray(MP).dtype == np.float32
    MP_ref, _ = compute_matrix_profile_reference(T, m)
    assert np.abs(np.asarray(MP, np.float64) - MP_ref).max() < 1e-6


@pytest.mark.parametrize("f_small", ["0", "1", "8"])
def test_ring_two_tier_cond_matches(monkeypatch, f_small):
    """The per-job two-tier lax.cond changes only the panel width a
    job's sparse pass B runs at: results are byte-identical with the
    small branch disabled (0), taken almost never (1), or taken by
    most jobs (8)."""
    import importlib

    import mpx.parallel.ring as ring_mod

    T = random_walk(1024, seed=11)
    m = 16
    base = ring_mod.run_ring_hybrid_f64(T, m, num_shards=2, band=64,
                                        chunk=128)
    monkeypatch.setenv("MPX_RING_SUSPECT_F_SMALL", f_small)
    importlib.reload(ring_mod)
    try:
        got = ring_mod.run_ring_hybrid_f64(T, m, num_shards=2, band=64,
                                           chunk=128)
    finally:
        monkeypatch.delenv("MPX_RING_SUSPECT_F_SMALL")
        importlib.reload(ring_mod)
    np.testing.assert_array_equal(got[0], base[0])
    np.testing.assert_array_equal(got[1], base[1])
