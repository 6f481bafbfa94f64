"""Device runtime layer.

The analog of the reference's OpenCL wrapper (include/host/OpenCL.hpp):
where that wraps Xilinx device discovery, DDR-bank buffer placement,
xclbin programming, and queue synchronization, the TPU equivalents are

* device discovery            -> :func:`devices` / :class:`DeviceContext`
* ``Buffer::CopyFromHost``    -> :meth:`DeviceContext.to_device`
* ``Buffer::CopyToHost``      -> :meth:`DeviceContext.to_host`
* xclbin ``Program``          -> jit compilation + the persistent
                                 compilation cache (:func:`enable_compilation_cache`)
* ``Context::Finish`` (ns)    -> :meth:`DeviceContext.finish`
* compute-unit addressing     -> the mesh in :mod:`mpx.parallel.mesh`

There is deliberately no buffer-bank management: XLA owns HBM placement.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import numpy as np

from mpx.utils.logging import Logger

_CACHE_ENABLED = False


def _cpu_cache_suffix() -> str:
    """Per-machine suffix for CPU-backend cache dirs.

    XLA:CPU persists AOT-compiled executables whose machine features are
    baked in at compile time; loading one on a host with different
    features logs ``cpu_aot_loader`` errors and can SIGILL/segfault
    (observed: flaky crashes in ``get_executable_and_time`` when this
    container migrated hosts between sessions).  TPU executables are
    device-keyed and safe to share, so only CPU runs get the suffix."""
    try:
        import hashlib

        with open("/proc/cpuinfo") as f:
            flags = [ln for ln in f if ln.startswith("flags")]
        digest = hashlib.sha256(flags[0].encode()).hexdigest()[:8]
        return f"-cpu-{digest}"
    except Exception:
        return "-cpu-unknown"


def enable_compilation_cache(path: Optional[str] = None):
    """Persist compiled executables across processes (the analog of
    shipping a prebuilt xclbin instead of re-synthesizing).  Safe to call
    repeatedly."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    path = path or os.environ.get(
        "MPX_COMPILE_CACHE", os.path.expanduser("~/.cache/mpx-jax")
    )
    # CPU backends get a per-machine cache dir (see _cpu_cache_suffix):
    # explicit request, or no accelerator plugin registered at all (the
    # silent fall-back-to-CPU path hits the same cross-host AOT hazard).
    cpu_only = False
    try:
        from jax._src import xla_bridge

        cpu_only = set(xla_bridge._backend_factories) == {"cpu"}
    except Exception:
        pass
    if (
        str(jax.config.jax_platforms or "").startswith("cpu")
        or os.environ.get("MPX_PLATFORM", "").startswith("cpu")
        or cpu_only
    ):
        path = path + _cpu_cache_suffix()
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _CACHE_ENABLED = True
        Logger.verbose_log(f"compilation cache at {path}")
    except Exception as e:  # cache support is best-effort
        Logger.warning(f"compilation cache unavailable: {e}")


def devices(platform: Optional[str] = None):
    return jax.devices(platform) if platform else jax.devices()


class DeviceContext:
    """Thin staging/synchronization helper around one device."""

    def __init__(self, device=None):
        self.device = device if device is not None else jax.devices()[0]
        self._pending = []

    def to_device(self, array, dtype=None):
        arr = np.asarray(array, dtype=dtype) if dtype else np.asarray(array)
        out = jax.device_put(arr, self.device)
        self._pending.append(out)
        return out

    @staticmethod
    def to_host(array) -> np.ndarray:
        return np.asarray(array)

    def finish(self, *values) -> int:
        """Block until all tracked (and passed) values are ready; returns
        elapsed nanoseconds (Context::Finish analog, OpenCL.hpp:85-89)."""
        t0 = time.perf_counter_ns()
        jax.block_until_ready(list(values) + self._pending)
        self._pending.clear()
        return time.perf_counter_ns() - t0

    @property
    def platform(self) -> str:
        return self.device.platform

    def memory_stats(self) -> dict:
        try:
            return dict(self.device.memory_stats() or {})
        except Exception:
            return {}
