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
