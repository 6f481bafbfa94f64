"""Job-level checkpoint / resume.

The reference has no checkpointing; its host-side aggregate arrays are
exactly the state one would persist between diagonal chunks (SURVEY §5).
mpx makes that a real feature: the job grid is processed in groups, and
after each group the partial row/column aggregates (plus a config/input
fingerprint and the next group index) are written atomically to an .npz.
A rerun with the same input and config resumes at the first unfinished
group; anything else starts fresh.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile

import jax.numpy as jnp
import numpy as np

from mpx.config import MatrixProfileConfig, make_job_grid, pad_job_grid
from mpx.dtypes import canonical_dtype
from mpx.driver import run_jobs, _agg_length
from mpx.kernels import resolve_kernel
from mpx.ops.aggregates import init_aggregates, postcompute
from mpx.ops.precompute import precompute_statistics
from mpx.dtypes import AGGREGATE_INIT
from mpx.types import Aggregates
from mpx.utils.logging import Logger
from mpx.utils.profile import phase as _phase


def _fingerprint(T: np.ndarray, cfg: MatrixProfileConfig, w: int,
                 group_jobs: int = 0, kernel: str = "") -> str:
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(np.asarray(T, np.float64)).tobytes())
    meta = json.dumps(
        {
            "m": cfg.m,
            "dtype": str(canonical_dtype(cfg.dtype)),
            "band": cfg.band,
            "chunk": cfg.chunk,
            "w": w,
            # group size defines what next_group indexes; resuming with a
            # different grouping would skip or repeat jobs
            "group_jobs": group_jobs,
            # resolved kernel + matmul precision: merging partial
            # aggregates produced by a different backend/precision stays
            # within tolerance but is not reproducible against an
            # uninterrupted run
            "kernel": kernel,
            "mxu_precision": os.environ.get("MPX_MXU_PRECISION", "HIGHEST"),
        },
        sort_keys=True,
    )
    h.update(meta.encode())
    return h.hexdigest()


def _save(path: str, rows: Aggregates, cols: Aggregates, next_group: int, fp: str):
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(os.path.abspath(path)) or ".")
    os.close(fd)
    np.savez(
        tmp,
        rows_value=np.asarray(rows.value),
        rows_index=np.asarray(rows.index),
        cols_value=np.asarray(cols.value),
        cols_index=np.asarray(cols.index),
        next_group=next_group,
        fingerprint=fp,
    )
    os.replace(tmp + ".npz", path)
    if os.path.exists(tmp):
        os.remove(tmp)


def _load(path: str, fp: str):
    if not os.path.exists(path):
        return None
    try:
        data = np.load(path, allow_pickle=False)
    except Exception as e:  # corrupt checkpoint -> start fresh
        Logger.warning(f"ignoring unreadable checkpoint {path}: {e}")
        return None
    if str(data["fingerprint"]) != fp:
        Logger.warning(f"checkpoint {path} does not match input/config; ignoring")
        return None
    rows = Aggregates(jnp.asarray(data["rows_value"]), jnp.asarray(data["rows_index"]))
    cols = Aggregates(jnp.asarray(data["cols_value"]), jnp.asarray(data["cols_index"]))
    return rows, cols, int(data["next_group"])


def compute_with_checkpoint(
    T,
    cfg: MatrixProfileConfig,
    checkpoint_path: str,
    *,
    group_jobs: int = 64,
    profile=None,
    keep_checkpoint: bool = False,
):
    """Resumable matrix-profile computation (single device).

    Processes the job grid in groups of ``group_jobs`` jobs, persisting
    aggregates after each group.  Returns (MP, MPI) and removes the
    checkpoint on success unless ``keep_checkpoint``.
    """
    T = np.asarray(T)
    n = T.shape[0]
    cfg.validate_series(n, T)
    m = cfg.m
    w = n - m + 1
    cfg = cfg.shrink_to(w)
    S, W = cfg.band, cfg.chunk
    dt = canonical_dtype(cfg.dtype)
    kernel = resolve_kernel(cfg.kernel, dt, m)
    if kernel == "hybrid":
        raise ValueError(
            "checkpointing is for long straight-f64 sweeps; the hybrid "
            "tier runs in grouped f32 passes and needs no checkpoint"
        )
    fp = _fingerprint(T, cfg, w, group_jobs, kernel)

    with _phase(profile, "1. Pre-Computation [device]"):
        stats = precompute_statistics(T, m, band=S, chunk=W, dtype=dt)

    grid = make_job_grid(w, S, W)
    grid = pad_job_grid(grid, group_jobs, dummy_r0=w)
    num_groups = grid.r0.shape[0] // group_jobs

    from mpx.dtypes import needs_x64, x64_scope

    x64 = needs_x64(dt)
    L = _agg_length(w, S, W)
    with x64_scope(x64):
        # Load inside the scope: jnp.asarray would silently canonicalize
        # float64 checkpoint arrays to float32 with x64 off.
        state = _load(checkpoint_path, fp)
        if state is None:
            rows = init_aggregates(L, dt, AGGREGATE_INIT)
            cols = init_aggregates(L, dt, AGGREGATE_INIT)
            start = 0
        else:
            rows, cols, start = state
            Logger.info(f"resuming from checkpoint: group {start}/{num_groups}")

        for g in range(start, num_groups):
            sl = slice(g * group_jobs, (g + 1) * group_jobs)
            with _phase(profile, f"2. Compute [{kernel}]", f"group_{g}"):
                g_rows, g_cols = run_jobs(
                    stats,
                    jnp.asarray(grid.r0[sl]),
                    jnp.asarray(grid.k0[sl]),
                    S=S, W=W, m=m, w=w, kernel=kernel, dtype=str(dt),
                    interpret=cfg.interpret,
                    tr=cfg.tile_rows, tc=cfg.tile_cols,
                )
                from mpx.ops.aggregates import merge_aggregates

                rows = merge_aggregates(rows, g_rows)
                cols = merge_aggregates(cols, g_cols)
            _save(checkpoint_path, rows, cols, g + 1, fp)

        with _phase(profile, "3. Post-Computation [device]"):
            MP, MPI = postcompute(rows, cols, m, w)
            MP, MPI = np.asarray(MP), np.asarray(MPI)
    if not keep_checkpoint and os.path.exists(checkpoint_path):
        os.remove(checkpoint_path)
    return MP, MPI
