"""Device mesh construction.

The analog of the reference's compute-unit / DDR-bank topology
(config/link-config.cfg.in, include/host/OpenCL.hpp:187-211): instead of N
replicated kernels each owning a DDR bank, mpx lays a 1-D
``jax.sharding.Mesh`` over the chips and shards the *job list*; inputs are
replicated (they are O(n), tiny next to the O(n^2) work) and partial
profiles are merged with on-device max/argmax reductions over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def default_mesh(num_devices: Optional[int] = None, axis: str = "jobs") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, only {len(devices)} available"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))
