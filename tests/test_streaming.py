"""Streaming (incremental) profile vs batch recomputation."""

import numpy as np
import pytest

from mpx.reference import compute_matrix_profile_reference
from mpx.streaming import StreamingMatrixProfile
from tests.conftest import random_walk
from tests.helpers import assert_profile_close


def test_streaming_matches_batch_f64():
    T = random_walk(700, seed=41)
    m = 32
    smp = StreamingMatrixProfile(T[:400], m=m, dtype="float64")
    for start in range(400, 700, 100):
        smp.append(T[start : start + 100])
    MP, MPI = smp.profile()
    MP_exp, MPI_exp = compute_matrix_profile_reference(T, m)
    assert_profile_close(T, m, MP, MPI, MP_exp, MPI_exp, eps=1e-8)


def test_streaming_single_point_appends():
    T = random_walk(300, seed=43)
    m = 16
    smp = StreamingMatrixProfile(T[:290], m=m, dtype="float64")
    for x in T[290:]:
        smp.append([x])
    MP, MPI = smp.profile()
    MP_exp, MPI_exp = compute_matrix_profile_reference(T, m)
    assert_profile_close(T, m, MP, MPI, MP_exp, MPI_exp, eps=1e-8)


def test_streaming_f32_tolerance():
    T = random_walk(600, seed=44)
    m = 32
    smp = StreamingMatrixProfile(T[:500], m=m, dtype="float32")
    smp.append(T[500:])
    MP, MPI = smp.profile()
    MP_exp, MPI_exp = compute_matrix_profile_reference(T, m)
    assert_profile_close(T, m, MP, MPI, MP_exp, MPI_exp, eps=2e-3)
