"""Compare suspect-sweep epilogue formulations (pass B of the hybrid tier).

All compute the same per-row/col (cnt, mn1, mn2, mx1, mx2); candidates:
  current — 10 full-tile reductions (XLA multi-output fusion decides reads)
  blocked — explicit two-level: per-(row, 256-col-block) 5-tuple first
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpx.runtime import enable_compilation_cache

enable_compilation_cache()

S, W, m = 4096, 16384, 256
PAIRS = S * W
P_HI = jax.lax.Precision.HIGHEST
BIGI = np.int32(2**30)

key = jax.random.PRNGKey(0)
Ur = jax.random.normal(key, (S, m), jnp.float32) / np.sqrt(m)
Uc = jax.random.normal(jax.random.PRNGKey(1), (W, m), jnp.float32) / np.sqrt(m)
thr_r = jnp.full((S,), 0.62, jnp.float32)   # ~sparse hits
thr_c = jnp.full((W,), 0.62, jnp.float32)


def mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=P_HI)


def reduce_axis(mask, idx, axis):
    cnt = jnp.sum(mask, axis=axis, dtype=jnp.int32)
    lo = jnp.where(mask, idx, BIGI)
    hi = jnp.where(mask, idx, np.int32(-1))
    mn1 = jnp.min(lo, axis=axis)
    mx1 = jnp.max(hi, axis=axis)
    mn2 = jnp.min(jnp.where(idx == jnp.expand_dims(mn1, axis), BIGI, lo), axis=axis)
    mx2 = jnp.max(jnp.where(idx == jnp.expand_dims(mx1, axis), np.int32(-1), hi), axis=axis)
    return cnt, mn1, mn2, mx1, mx2


@jax.jit
def e_maxidx(Ur, Uc):
    P = mm(Ur, Uc)
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]
    rows = jnp.arange(S, dtype=jnp.int32)[:, None]
    rv = jnp.max(P, axis=1)
    ri = jnp.min(jnp.where(P == rv[:, None], cols, BIGI), axis=1)
    cv = jnp.max(P, axis=0)
    ci = jnp.min(jnp.where(P == cv[None, :], rows, BIGI), axis=0)
    return rv, ri, cv, ci


@jax.jit
def e_current(Ur, Uc, thr_r, thr_c):
    P = mm(Ur, Uc)
    cols = jnp.broadcast_to(jnp.arange(W, dtype=jnp.int32)[None, :], (S, W))
    rows = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[:, None], (S, W))
    hr = P >= thr_r[:, None]
    hc = P >= thr_c[None, :]
    return reduce_axis(hr, cols, 1), reduce_axis(hc, rows, 0)


def make_blocked(C):
    @jax.jit
    def e_blocked(Ur, Uc, thr_r, thr_c):
        P = mm(Ur, Uc)
        # row side, two-level
        Pb = P.reshape(S, W // C, C)
        ic = jnp.arange(C, dtype=jnp.int32)[None, None, :]
        hb = Pb >= thr_r[:, None, None]
        bcnt = jnp.sum(hb, axis=2, dtype=jnp.int32)          # (S, W/C)
        blo = jnp.where(hb, ic, BIGI)
        bhi = jnp.where(hb, ic, np.int32(-1))
        bmn1 = jnp.min(blo, axis=2)
        bmx1 = jnp.max(bhi, axis=2)
        bmn2 = jnp.min(jnp.where(ic == bmn1[:, :, None], BIGI, blo), axis=2)
        bmx2 = jnp.max(jnp.where(ic == bmx1[:, :, None], np.int32(-1), bhi), axis=2)
        # second level over the tiny (S, W/C) arrays
        base = (jnp.arange(W // C, dtype=jnp.int32) * C)[None, :]
        gmn1 = jnp.min(jnp.where(bmn1 == BIGI, BIGI, bmn1 + base), axis=1)
        # global mn2: min over (second in own block, first in other blocks)
        c1 = jnp.where(bmn2 == BIGI, BIGI, bmn2 + base)
        a1 = jnp.where(bmn1 == BIGI, BIGI, bmn1 + base)
        m1 = jnp.min(a1, axis=1)
        a1x = jnp.where(a1 == m1[:, None], c1, a1)  # replace the winner with its block-second
        gmn2 = jnp.min(jnp.minimum(a1x, c1), axis=1)
        gcnt = jnp.sum(bcnt, axis=1)
        h1 = jnp.where(bmx1 < 0, np.int32(-1), bmx1 + base)
        h2 = jnp.where(bmx2 < 0, np.int32(-1), bmx2 + base)
        M1 = jnp.max(h1, axis=1)
        h1x = jnp.where(h1 == M1[:, None], h2, h1)
        gmx2 = jnp.max(jnp.maximum(h1x, h2), axis=1)
        # col side: plain full reductions (axis 0)
        rows = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[:, None], (S, W))
        hc = P >= thr_c[None, :]
        colred = reduce_axis(hc, rows, 0)
        return (gcnt, gmn1, gmn2, M1, gmx2), colred
    return e_blocked


def bench(fn, args, iters=16, warm=2):
    for _ in range(warm):
        np.asarray(jax.tree.leaves(fn(*args))[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


if __name__ == "__main__":
    for name, fn, args in [
        ("passA", e_maxidx, (Ur, Uc)),
        ("current", e_current, (Ur, Uc, thr_r, thr_c)),
        ("blocked256", make_blocked(256), (Ur, Uc, thr_r, thr_c)),
        ("blocked512", make_blocked(512), (Ur, Uc, thr_r, thr_c)),
    ]:
        try:
            dt = bench(fn, args)
            print(f"{name:12s} {dt*1e3:8.2f} ms  {PAIRS/dt/1e9:7.2f} Gpairs/s")
        except Exception as e:
            print(name, "failed:", str(e)[:300])
