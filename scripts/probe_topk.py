"""Measure candidate-extraction epilogues for the f64 hybrid tier.

Times, on the real chip, a (S x W) f32 correlation tile matmul with
different epilogues:
  max1     — row max only (does the single reduction fuse?)
  max2     — row+col max (current mxu kernel epilogue)
  topk     — lax.top_k(P, k) along rows
  approx   — lax.approx_max_k(P, k)
  blockmax — reduce to (S, W/C) block maxes, then top_k over blocks
  f64resc  — candidate rescoring: gather (B, k, m) windows + f64 dot
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from mpx.runtime import enable_compilation_cache

enable_compilation_cache()

S, W, m, k = 4096, 16384, 256, 8
PAIRS = S * W

key = jax.random.PRNGKey(0)
Ur = jax.random.normal(key, (S, m), jnp.float32) / np.sqrt(m)
Uc = jax.random.normal(jax.random.PRNGKey(1), (W, m), jnp.float32) / np.sqrt(m)

P_HI = jax.lax.Precision.HIGHEST


def mm(Ur, Uc):
    return jax.lax.dot_general(Ur, Uc, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=P_HI)


@jax.jit
def e_mm(Ur, Uc):
    return jnp.sum(mm(Ur, Uc))  # force use; sum is one cheap read


@jax.jit
def e_max1(Ur, Uc):
    return jnp.max(mm(Ur, Uc), axis=1)


@jax.jit
def e_max2(Ur, Uc):
    P = mm(Ur, Uc)
    return jnp.max(P, axis=1), jnp.max(P, axis=0)


@jax.jit
def e_max2idx(Ur, Uc):
    # current mxu epilogue: max + iota-min tie index, both axes
    P = mm(Ur, Uc)
    big = np.int32(2**30)
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]
    rows = jnp.arange(S, dtype=jnp.int32)[:, None]
    rv = jnp.max(P, axis=1)
    ri = jnp.min(jnp.where(P == rv[:, None], cols, big), axis=1)
    cv = jnp.max(P, axis=0)
    ci = jnp.min(jnp.where(P == cv[None, :], rows, big), axis=0)
    return rv, ri, cv, ci


@jax.jit
def e_topk(Ur, Uc):
    return jax.lax.top_k(mm(Ur, Uc), k)


@jax.jit
def e_approx(Ur, Uc):
    return jax.lax.approx_max_k(mm(Ur, Uc), k)


def make_blockmax(C):
    @jax.jit
    def e_blockmax(Ur, Uc):
        P = mm(Ur, Uc).reshape(S, W // C, C)
        bм = jnp.max(P, axis=2)
        bi = jnp.argmax(P, axis=2)  # index within block (small array)
        v, bidx = jax.lax.top_k(bм, k)
        inner = jnp.take_along_axis(bi, bidx, axis=1)
        return v, bidx * C + inner
    return e_blockmax


B = 65536
T64 = None


def bench(fn, args, iters=4, warm=1):
    for _ in range(warm):
        np.asarray(jax.tree.leaves(fn(*args))[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / iters
    return dt


def report(name, dt):
    print(f"{name:12s} {dt*1e3:9.2f} ms   {PAIRS/dt/1e9:8.2f} Gpairs/s")


if __name__ == "__main__":
    report("mm+sum", bench(e_mm, (Ur, Uc)))
    report("max1", bench(e_max1, (Ur, Uc)))
    report("max2", bench(e_max2, (Ur, Uc)))
    report("max2idx", bench(e_max2idx, (Ur, Uc)))
    report("topk8", bench(e_topk, (Ur, Uc)))
    try:
        report("approx8", bench(e_approx, (Ur, Uc)))
    except Exception as e:
        print("approx8 failed:", str(e)[:200])
    for C in (64, 128, 256):
        try:
            report(f"blockmax{C}", bench(make_blockmax(C), (Ur, Uc)))
        except Exception as e:
            print(f"blockmax{C} failed:", str(e)[:200])

    # f64 rescore: B rows, k candidates each, window length m
    from mpx.dtypes import x64_scope

    with x64_scope():
        Tw = jnp.asarray(np.random.default_rng(0).standard_normal(2**20 + m),
                         jnp.float64)
        cand = jnp.asarray(
            np.random.default_rng(1).integers(0, 2**20, (B, k)), jnp.int32)
        rows0 = jnp.asarray(np.arange(B, dtype=np.int32))

        @jax.jit
        def rescore(Tw, cand, rows0):
            j = jnp.arange(m, dtype=jnp.int32)
            Wr = Tw[rows0[:, None] + j[None, :]]            # (B, m)
            Wc = Tw[cand[:, :, None] + j[None, None, :]]    # (B, k, m)
            Wr = Wr - jnp.mean(Wr, axis=1, keepdims=True)
            Wc = Wc - jnp.mean(Wc, axis=2, keepdims=True)
            qt = jnp.einsum("bm,bkm->bk", Wr, Wc,
                            precision=jax.lax.Precision.HIGHEST)
            return qt

        dt = bench(rescore, (Tw, cand, rows0))
        print(f"f64resc      {dt*1e3:9.2f} ms   "
              f"{B*k/dt/1e6:8.2f} Mcand/s  ({B*k*m*2/dt/1e9:.1f} GFLOP/s)")
