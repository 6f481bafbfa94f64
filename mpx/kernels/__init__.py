"""Kernel backends.

Two implementations of the same band-sweep contract (see
:mod:`mpx.kernels.common`):

* ``xla``    — pure jnp/lax.scan sweep; runs on any backend, supports
  float64, and is the behavioral analog of the reference's Vanilla kernel
  (kernel/MatrixProfileKernelVanilla.cpp).
* ``pallas`` — hand-tiled Pallas TPU kernel, the analog of the Tiled
  systolic kernel (kernel/MatrixProfileKernelTiled.cpp) re-designed for
  the VPU/VMEM instead of a PE chain.

``resolve_kernel`` implements the 'auto' policy: pallas on TPU for float32,
xla otherwise (float64 is not supported by Mosaic vector ops).
"""

from __future__ import annotations

import jax
import numpy as np

from mpx.kernels.common import BandOut, band_geometry
from mpx.kernels.xla import sweep_band_xla


def resolve_kernel(kernel: str, dtype, interpret: bool = False) -> str:
    if kernel != "auto":
        return kernel
    if np.dtype(dtype) == np.dtype(np.float64):
        return "xla"
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        platform = "cpu"
    return "pallas" if platform in ("tpu", "axon") else "xla"


def get_sweep_fn(kernel: str):
    if kernel == "xla":
        return sweep_band_xla
    if kernel == "pallas":
        from mpx.kernels.pallas_tpu import sweep_band_pallas

        return sweep_band_pallas
    raise ValueError(f"unknown kernel {kernel!r}")


__all__ = ["BandOut", "band_geometry", "resolve_kernel", "get_sweep_fn", "sweep_band_xla"]
