"""mpx — a TPU-native matrix-profile (SCAMP) framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
``matrix-profile-hls`` FPGA reference (Vitis HLS SCAMP self-join engine):
given a time series ``T`` of length ``n`` and a subsequence length ``m``,
compute the self-join matrix profile ``MP`` (z-normalized Euclidean distance
of each length-``m`` subsequence to its nearest non-trivial neighbor) and the
matrix profile index ``MPI``.

Architecture (TPU-first, not a translation of the HLS dataflow design):

* the upper-triangular (n-m+1)^2 join is decomposed into independent
  (row-band x diagonal-chunk) *jobs*;
* each job seeds its QT row exactly with the closed form
  ``QT(r, c) = SDP(r, c) - m * mu[r] * mu[c]`` (a sliding-dot-product that
  maps onto the MXU), then runs the SCAMP O(1) diagonal-update recurrence
  over the band's rows on the VPU;
* row/column argmax aggregates are merged on-device with max-merges
  (the analog of the reference host driver's ``UpdateAggregates``,
  include/host/HostSideComputation.hpp:72-90);
* multi-chip scaling shards the job list over a ``jax.sharding.Mesh`` and
  merges partial profiles with an ICI max/argmax allreduce (the analog of
  the reference's MP_KERNEL_REPL compute-unit replication).

Double precision (the reference's flagship dtype) is supported through
JAX x64 mode; it is enabled at import unless ``MPX_NO_X64=1``.
"""

from __future__ import annotations

import os

if os.environ.get("MPX_NO_X64") != "1":
    import jax

    jax.config.update("jax_enable_x64", True)

from mpx.config import MatrixProfileConfig  # noqa: E402
from mpx.driver import compute_matrix_profile, matrix_profile  # noqa: E402
from mpx.dtypes import AGGREGATE_INIT, INDEX_INIT  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "MatrixProfileConfig",
    "compute_matrix_profile",
    "matrix_profile",
    "AGGREGATE_INIT",
    "INDEX_INIT",
    "__version__",
]
