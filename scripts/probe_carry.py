"""Isolate the scan-carry merge cost of pass B: does slice -> combine ->
dynamic_update_slice on large carries alias in place, or copy?"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from mpx.runtime import enable_compilation_cache

enable_compilation_cache()

L = 1 << 20
S, W, K = 4096, 16384, 4
N_IT = 1024


@jax.jit
def _digest(out):
    return sum(jnp.sum(a) for a in jax.tree.leaves(out))


def timeit(fn, *args):
    for _ in range(2):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(_digest(out))
        dt = time.perf_counter() - t0
    return dt / N_IT * 1e3  # ms/iter


r0s = jnp.asarray((np.arange(N_IT) * 37) % (L - S - 1), jnp.int32)

# Variant 1: the current pattern — slice, sort-merge, update (6 arrays).
cnt = jnp.zeros((L,), jnp.int32)
mn = jnp.zeros((L, K), jnp.int32)
mx = jnp.zeros((L, K), jnp.int32)
cnt2 = jnp.zeros((L,), jnp.int32)
mn2 = jnp.zeros((L, K), jnp.int32)
mx2 = jnp.zeros((L, K), jnp.int32)


@jax.jit
def scan_merge(cnt, mn, mx, cnt2, mn2, mx2, r0s):
    def body(carry, r0):
        cnt, mn, mx, cnt2, mn2, mx2 = carry
        win_c = jnp.full((W,), 1, jnp.int32)
        win_m = jnp.full((W, K), 7, jnp.int32)
        z = np.int32(0)
        def merge(cnt, mn, mx, off, sz):
            c = jax.lax.dynamic_slice(cnt, (off,), (sz,)) + win_c[:sz]
            a = jax.lax.dynamic_slice(mn, (off, z), (sz, K))
            mrg = jnp.sort(jnp.concatenate([a, win_m[:sz]], -1), -1)[..., :K]
            b = jax.lax.dynamic_slice(mx, (off, z), (sz, K))
            mrg2 = jnp.sort(jnp.concatenate([b, win_m[:sz]], -1), -1)[..., K:]
            return (jax.lax.dynamic_update_slice(cnt, c, (off,)),
                    jax.lax.dynamic_update_slice(mn, mrg, (off, z)),
                    jax.lax.dynamic_update_slice(mx, mrg2, (off, z)))
        cnt, mn, mx = merge(cnt, mn, mx, r0, S)
        cnt2, mn2, mx2 = merge(cnt2, mn2, mx2, r0, W)
        return (cnt, mn, mx, cnt2, mn2, mx2), None
    return jax.lax.scan(body, (cnt, mn, mx, cnt2, mn2, mx2), r0s)[0]


print(f"slice+sort+DUS merge: {timeit(scan_merge, cnt, mn, mx, cnt2, mn2, mx2, r0s):.3f} ms/iter")


# Variant 2: pure DUS (no read of the carry) — aliasing baseline.
@jax.jit
def scan_pure_dus(cnt, mn, mx, cnt2, mn2, mx2, r0s):
    def body(carry, r0):
        cnt, mn, mx, cnt2, mn2, mx2 = carry
        z = np.int32(0)
        win_c = jnp.full((W,), 1, jnp.int32)
        win_m = jnp.full((W, K), 7, jnp.int32)
        cnt = jax.lax.dynamic_update_slice(cnt, win_c[:S], (r0,))
        mn = jax.lax.dynamic_update_slice(mn, win_m[:S], (r0, z))
        mx = jax.lax.dynamic_update_slice(mx, win_m[:S], (r0, z))
        cnt2 = jax.lax.dynamic_update_slice(cnt2, win_c, (r0,))
        mn2 = jax.lax.dynamic_update_slice(mn2, win_m, (r0, z))
        mx2 = jax.lax.dynamic_update_slice(mx2, win_m, (r0, z))
        return (cnt, mn, mx, cnt2, mn2, mx2), None
    return jax.lax.scan(body, (cnt, mn, mx, cnt2, mn2, mx2), r0s)[0]


print(f"pure DUS:            {timeit(scan_pure_dus, cnt, mn, mx, cnt2, mn2, mx2, r0s):.3f} ms/iter")


# Variant 3: slice -> elementwise min/max network (no concat/sort) -> DUS.
@jax.jit
def scan_net(cnt, mn, mx, cnt2, mn2, mx2, r0s):
    def body(carry, r0):
        cnt, mn, mx, cnt2, mn2, mx2 = carry
        z = np.int32(0)
        win_c = jnp.full((W,), 1, jnp.int32)
        win_m = jnp.full((W, K), 7, jnp.int32)
        def merge(cnt, mn, mx, off, sz):
            c = jax.lax.dynamic_slice(cnt, (off,), (sz,)) + win_c[:sz]
            a = jax.lax.dynamic_slice(mn, (off, z), (sz, K))
            # odd-even merge of two sorted K-vectors, K=4: min/max net
            m1 = jnp.minimum(a, win_m[:sz])
            m2 = jnp.maximum(a, win_m[:sz])
            mrg = jnp.concatenate([m1[..., :2], jnp.minimum(m1[..., 2:], m2[..., :2])], -1)
            b = jax.lax.dynamic_slice(mx, (off, z), (sz, K))
            mrg2 = jnp.maximum(b, win_m[:sz])
            return (jax.lax.dynamic_update_slice(cnt, c, (off,)),
                    jax.lax.dynamic_update_slice(mn, mrg, (off, z)),
                    jax.lax.dynamic_update_slice(mx, mrg2, (off, z)))
        cnt, mn, mx = merge(cnt, mn, mx, r0, S)
        cnt2, mn2, mx2 = merge(cnt2, mn2, mx2, r0, W)
        return (cnt, mn, mx, cnt2, mn2, mx2), None
    return jax.lax.scan(body, (cnt, mn, mx, cnt2, mn2, mx2), r0s)[0]


print(f"slice+net+DUS:       {timeit(scan_net, cnt, mn, mx, cnt2, mn2, mx2, r0s):.3f} ms/iter")
