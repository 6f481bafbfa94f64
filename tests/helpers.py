"""Shared test assertions.

Implements the reference harness's comparison rules
(test/include/MatrixProfileTests.hpp:199-212):

* profiles match to an absolute epsilon (1e-8 for float64);
* index mismatches are allowed iff the two candidate neighbors are
  equidistant — tie-breaking order legitimately differs between
  implementations — checked by recomputing both z-normalized distances.
"""

from __future__ import annotations

import numpy as np

from mpx.reference import rolling_statistics


def znorm_distance(T: np.ndarray, m: int, i: int, j: int) -> float:
    """Exact z-normalized Euclidean distance between subsequences i and j."""
    mu, _, _, inv = rolling_statistics(np.asarray(T, np.float64), m)
    a = (T[i : i + m] - mu[i]) * inv[i]
    b = (T[j : j + m] - mu[j]) * inv[j]
    return float(np.sqrt(np.sum((a - b) ** 2)))


def assert_profile_close(T, m, MP, MPI, MP_exp, MPI_exp, eps: float):
    MP = np.asarray(MP, np.float64)
    MP_exp = np.asarray(MP_exp, np.float64)
    MPI = np.asarray(MPI)
    MPI_exp = np.asarray(MPI_exp)

    np.testing.assert_allclose(MP, MP_exp, atol=eps, rtol=0, err_msg="profile mismatch")

    mismatched = np.nonzero(MPI != MPI_exp)[0]
    for i in mismatched:
        # Allowed iff equidistant (within eps): recompute both distances.
        d_got = znorm_distance(T, m, int(i), int(MPI[i]))
        d_exp = znorm_distance(T, m, int(i), int(MPI_exp[i]))
        assert abs(d_got - d_exp) <= max(eps, 1e-7), (
            f"MPI[{i}]: got {MPI[i]} (d={d_got}), expected {MPI_exp[i]} "
            f"(d={d_exp}) — not an equidistant tie"
        )
