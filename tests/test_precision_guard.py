"""Every device matmul must carry an EXPLICIT precision.

TPU's DEFAULT f32 dot_general is a one-pass bf16 matmul (8 mantissa
bits).  That is catastrophic for this codebase's one-hot index
machinery — encoded suspect indices >= 2^9 round to multiples of their
magnitude/2^8 — and exceeds the hybrid margin budget for value-carrying
scatters.  CPU ignores precision hints entirely, so a missing
``precision=`` argument passes every CPU test and corrupts results
only on hardware (observed: n=16384 f64, last-band capture slots
quantized to multiples of 64).

This guard traces the kernels and walks their jaxprs: any dot_general
whose precision is None (DEFAULT) fails the build here, on CPU, before
the bug can reach a chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _walk(jaxpr, found):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "dot_general":
            found.append(eqn.params.get("precision"))
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):
                _walk(v.jaxpr, found)
            elif isinstance(v, (list, tuple)):
                for it in v:
                    if hasattr(it, "jaxpr"):
                        _walk(it.jaxpr, found)


def assert_no_default_precision(fn, *args, **kwargs):
    jaxpr = jax.make_jaxpr(lambda *a: fn(*a, **kwargs))(*args)
    found = []
    _walk(jaxpr.jaxpr, found)
    assert found, "expected at least one dot_general"
    bad = [p for p in found if p is None]
    assert not bad, (
        f"{len(bad)}/{len(found)} dot_general(s) trace with DEFAULT "
        "precision — on TPU that is one-pass bf16; pass an explicit "
        "precision"
    )


def test_onehot_helpers_precision():
    from mpx.kernels.mxu import (
        SuspectWindow,
        _dense_merge_cols,
        _flagged_indices,
        _onehot_rows,
        _scatter_dense_max,
    )

    F, L, K = 8, 128, 4
    idx = jnp.arange(F, dtype=jnp.int32)
    win = SuspectWindow(
        cnt=jnp.zeros((F,), jnp.int32),
        mn=jnp.zeros((F, K), jnp.int32),
        mx=jnp.zeros((F, K), jnp.int32),
    )
    assert_no_default_precision(
        lambda i: _dense_merge_cols(i, win, F, L), idx
    )
    flags = jnp.zeros((L,), bool).at[3].set(True)
    assert_no_default_precision(
        lambda f: _flagged_indices(f, F, L), flags
    )
    U = jnp.ones((L, 16), jnp.float32)
    assert_no_default_precision(lambda i: _onehot_rows(i, U, F, L), idx)
    vals = jnp.ones((F,), jnp.float32)
    assert_no_default_precision(
        lambda i, v: _scatter_dense_max(i, v, F, L), idx, vals
    )


@pytest.mark.parametrize("mode", ["mxu", "max", "suspects", "sparse",
                                  "fused", "refine"])
def test_sweep_kernels_precision(mode):
    from mpx.kernels import band_geometry
    from mpx.kernels.mxu import (
        sweep_band_max,
        sweep_band_mxu,
        sweep_band_refine_sparse,
        sweep_band_suspects,
        sweep_band_suspects_fused,
        sweep_band_suspects_sparse,
    )
    from mpx.types import Stats

    S = W = 64
    m = 16
    w = 256
    geom = band_geometry(S, W, m, w, 8, W)
    L = w + max(S, W) + m
    stats = Stats(
        T=jnp.ones((L,), jnp.float32),
        mu=jnp.ones((w + W,), jnp.float32),
        df=jnp.ones((1,), jnp.float32),
        dg=jnp.ones((1,), jnp.float32),
        inv=jnp.ones((w + W,), jnp.float32),
        qt0=jnp.ones((1,), jnp.float32),
        windows=None,
    )
    thr = jnp.full((w + W,), 0.5, jnp.float32)
    r0 = jnp.int32(0)
    k0 = jnp.int32(16)
    F = 16
    jrow = jnp.zeros((S,), jnp.uint16)
    jcol = jnp.zeros((W,), jnp.uint16)

    if mode == "mxu":
        fn = lambda r: sweep_band_mxu(stats, r, k0, geom, jnp.float32)
    elif mode == "max":
        fn = lambda r: sweep_band_max(stats, r, k0, geom, jnp.float32)
    elif mode == "suspects":
        fn = lambda r: sweep_band_suspects(
            stats, r, k0, geom, jnp.float32, thr
        )
    elif mode == "sparse":
        fn = lambda r: sweep_band_suspects_sparse(
            stats, r, k0, jrow, jcol, geom, thr, F
        )
    elif mode == "fused":
        fn = lambda r: sweep_band_suspects_fused(
            stats, r, k0, geom, thr, F
        )
    else:
        fn = lambda r: sweep_band_refine_sparse(
            stats, r, k0, jrow, jcol, geom, thr, F
        )
    assert_no_default_precision(fn, r0)


def test_scan_flagged_rows_precision():
    from mpx.hybrid import scan_flagged_rows
    from mpx.types import Stats

    m, w = 16, 256
    CW = 64
    L = w + CW + m
    stats = Stats(
        T=jnp.ones((L,), jnp.float32),
        mu=jnp.ones((w + CW,), jnp.float32),
        df=jnp.ones((1,), jnp.float32),
        dg=jnp.ones((1,), jnp.float32),
        inv=jnp.ones((w + CW,), jnp.float32),
        qt0=jnp.ones((1,), jnp.float32),
        windows=None,
    )
    thr = jnp.full((w + CW,), 0.5, jnp.float32)
    flag = jnp.arange(8, dtype=jnp.int32)
    assert_no_default_precision(
        lambda f: scan_flagged_rows(
            stats, thr, f, m=m, w=w, excl=4, K=8, CW=CW
        ),
        flag,
    )
