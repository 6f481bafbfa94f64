"""Round-4 probe: time the two large-run statistics strategies at the
showcase geometry (n=2^20, m=256) on the real chip.

  A. device f64 stats: stage T64 (8.4 MB), run _precompute_jax_f64_matmul
     on device (emulated f64), fetch the 1-byte/window degeneracy mask.
  B. host-staged stats: native host stats (now ~0.05s) + stage
     T32+mu32+inv32 (12.6 MB) through the relay.

Prints warm per-step timings so the hybrid's device-stats crossover
(MPX_HYBRID_DEVICE_STATS_MIN_W) can be set from data.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mpx.runtime import enable_compilation_cache

enable_compilation_cache()

N, M = 1 << 20, 256
rng = np.random.default_rng(0)
T64 = np.cumsum(rng.standard_normal(N))
w = N - M + 1

from mpx import native
from mpx.ops.precompute import _precompute_jax_f64_matmul

jit_stats = jax.jit(_precompute_jax_f64_matmul, static_argnums=1)


def sync(x):
    jax.block_until_ready(x)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0][-1:]))


for rep in range(3):
    print(f"--- rep {rep} ---")
    # A. device stats
    t0 = time.time()
    Td = jnp.asarray(T64)
    sync(Td)
    t_stage64 = time.time() - t0
    t0 = time.time()
    mu, inv = jit_stats(Td, M)
    sync(inv)
    t_dev = time.time() - t0
    t0 = time.time()
    mask = np.asarray(jnp.isinf(inv))[:w]
    t_fetch = time.time() - t0
    print(f"A: stage T64 {t_stage64:.3f}s  dev f64 stats {t_dev:.3f}s  "
          f"mask fetch {t_fetch:.3f}s  total {t_stage64+t_dev+t_fetch:.3f}s")

    # B. host stats + stage
    t0 = time.time()
    s = native.precompute_stats(T64, M)
    t_host = time.time() - t0
    t0 = time.time()
    T32 = jnp.asarray(T64.astype(np.float32))
    mu32 = jnp.asarray(s["mu"].astype(np.float32))
    inv32 = jnp.asarray(s["inv"].astype(np.float32))
    sync((T32, mu32, inv32))
    t_stage = time.time() - t0
    print(f"B: host stats {t_host:.3f}s  stage T32+mu+inv {t_stage:.3f}s  "
          f"total {t_host+t_stage:.3f}s")
