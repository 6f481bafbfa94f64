"""Kernel backends.

Two implementations of the same band-sweep contract (see
:mod:`mpx.kernels.common`):

* ``mxu``    — the correlation tile as a unit-normalized-windows matmul;
  puts the O(n^2 m) FLOPs on the MXU where TPU throughput lives.  The
  default on every backend (it is also the best *CPU* kernel: BLAS).
* ``xla``    — pure jnp/lax.scan SCAMP recurrence; the behavioral analog
  of the reference's Vanilla kernel (kernel/MatrixProfileKernelVanilla.cpp);
  O(1) work per pair, preferable for very large m.
* ``pallas`` — hand-tiled Pallas TPU kernel, the analog of the Tiled
  systolic kernel (kernel/MatrixProfileKernelTiled.cpp) re-designed for
  the VPU/VMEM instead of a PE chain.

``resolve_kernel`` implements the 'auto' policy: the matmul kernel wins
whenever 2m FLOPs/pair on the MXU beat ~10 VPU ops/pair — i.e. for every
m the reference supports; the recurrence kernels take over for huge m.
"""

from __future__ import annotations

import jax
import numpy as np

from mpx.kernels.common import BandOut, band_geometry
from mpx.kernels.xla import sweep_band_xla

# Hybrid-tier eligibility ceiling: the hybrid's f32 MXU sweeps pay an
# O(m)-HLO compile cost (minutes beyond m~4096, amortized by the
# persistent cache); past it the strict f64 recurrence takes over.
MXU_MAX_M = 4096

# Measured v5e crossover sweep (n=65536 f32, round 2 — see ROADMAP.md):
#   m      mxu       pallas    xla
#   512    1.83e10   8.2e8     -
#   1024   1.08e10   4.2e8     -
#   2048   6.0e9     1.9e8     9.9e7
#   4096   3.3e9     -         -
#   8192   1.7e9     -         -
# The matmul kernel dominates at EVERY m (its rate halves per m
# doubling but starts ~20x ahead; the recurrence kernels are VPU/
# scan-bound).  There is no f32 crossover: auto is always 'mxu'.


# Minimum profile width for routing float32 'auto' through the hybrid
# tier: the hybrid's two-pass sweeps beat the one-pass materialize-and-
# argmax kernel by ~1.2-1.7x asymptotically (pass A writes no P tile,
# pass B touches ~1 row per job), but carry ~1-2s of fixed host work
# (f64 stats + rescore) — a wash at w ~ 2^19, a clear win beyond.
# Overridable for tests / other hardware.
import os as _os

HYBRID32_MIN_W = int(_os.environ.get("MPX_HYBRID32_MIN_W", 1 << 19))


def resolve_kernel(
    kernel: str,
    dtype,
    m: int = 0,
    interpret: bool = False,
    allow_hybrid: bool = False,
    w: int = 0,
) -> str:
    if kernel != "auto":
        return kernel
    if np.dtype(dtype) == np.dtype(np.float64):
        if allow_hybrid and (not m or m <= MXU_MAX_M):
            # float64 is XLA-emulated on TPU (~100x below f32); the
            # hybrid tier (f32 MXU sweeps + exact host-f64 rescoring,
            # mpx.hybrid) computes the identical exact profile orders of
            # magnitude faster.
            return "hybrid"
        if m and m > MXU_MAX_M:
            # emulated-f64 matmul is ~0.01 Tflop/s: at large m the O(1)
            # recurrence wins for the strict tier
            return "xla"
        return "mxu"
    if (
        np.dtype(dtype) == np.dtype(np.float32)
        and allow_hybrid
        and (not m or m <= MXU_MAX_M)
        and w >= HYBRID32_MIN_W
    ):
        # Large float32 self-joins: the hybrid tier is both faster than
        # the one-pass argmax kernel AND exact (f64-true values cast to
        # f32) — measured 9.8s vs 11.8s at the n=2^20 showcase.
        return "hybrid"
    return "mxu"


def get_sweep_fn(kernel: str):
    if kernel == "xla":
        return sweep_band_xla
    if kernel == "mxu":
        from mpx.kernels.mxu import sweep_band_mxu

        return sweep_band_mxu
    if kernel == "mxu_fused":
        from mpx.kernels.mxu_fused import sweep_band_mxu_fused

        return sweep_band_mxu_fused
    if kernel == "pallas":
        from mpx.kernels.pallas_tpu import sweep_band_pallas

        return sweep_band_pallas
    raise ValueError(f"unknown kernel {kernel!r}")


__all__ = ["BandOut", "band_geometry", "resolve_kernel", "get_sweep_fn", "sweep_band_xla"]
