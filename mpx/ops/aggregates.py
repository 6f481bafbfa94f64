"""Aggregate (max-correlation, index) merge operations.

The analog of the reference host's aggregate plumbing:

* ``merge_aggregates``      — UpdateAggregates (HostSideComputation.hpp:72-90):
  strict-greater max-merge of two (value, index) aggregate sets; the
  incumbent wins ties, preserving the reference's first-seen semantics.
* ``merge_window``          — the same merge applied to a window at a dynamic
  offset of a global aggregate array (how job outputs land in the global
  row/column profiles).
* ``postcompute``           — PostComputeAggregates (HostSideComputation.hpp:51-69):
  row/column merge + Pearson -> Euclidean conversion.

All run on-device inside jit; nothing here touches the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mpx.types import Aggregates


def merge_aggregates(a: Aggregates, b: Aggregates) -> Aggregates:
    """Elementwise max-merge; ``a`` (the incumbent) wins ties."""
    better = b.value > a.value
    return Aggregates(
        value=jnp.where(better, b.value, a.value),
        index=jnp.where(better, b.index, a.index),
    )


def merge_window(
    global_agg: Aggregates, window: Aggregates, offset
) -> Aggregates:
    """Max-merge ``window`` into ``global_agg`` starting at ``offset``.

    Because the merge is max-based, XLA's clamped dynamic-slice semantics
    are safe for padded/dummy jobs: an all-initialized window never wins.
    """
    size = window.value.shape[0]
    cur_v = jax.lax.dynamic_slice(global_agg.value, (offset,), (size,))
    cur_i = jax.lax.dynamic_slice(global_agg.index, (offset,), (size,))
    merged = merge_aggregates(Aggregates(cur_v, cur_i), window)
    return Aggregates(
        value=jax.lax.dynamic_update_slice(global_agg.value, merged.value, (offset,)),
        index=jax.lax.dynamic_update_slice(global_agg.index, merged.index, (offset,)),
    )


def pearson_to_euclidean(P, m: int):
    """dist = sqrt(2m(1 - P)) (HostSideComputation.hpp:47-49).

    Clamped at zero: rounding can push the correlation of near-identical
    windows epsilon past 1, and sqrt of the tiny negative would return
    NaN where the true distance is ~0 (the reference inherits the same
    hazard from std::sqrt; mpx clamps)."""
    return jnp.sqrt(jnp.maximum(2.0 * m * (1.0 - P), 0.0))


def postcompute(rows: Aggregates, cols: Aggregates, m: int, w: int):
    """Final row/column merge + distance conversion.

    Truncates padded aggregate arrays to the true profile length ``w`` and
    returns (MP distances, MPI int32 indices)."""
    merged = merge_aggregates(
        Aggregates(rows.value[:w], rows.index[:w]),
        Aggregates(cols.value[:w], cols.index[:w]),
    )
    return pearson_to_euclidean(merged.value, m), merged.index.astype(jnp.int32)


def postcompute_left_right(rows: Aggregates, cols: Aggregates, m: int, w: int):
    """Left/right matrix profiles.

    Every job pair (r, c) has c > r, so the row aggregates are exactly
    the RIGHT profile (nearest neighbor at a later index) and the column
    aggregates the LEFT profile (nearest earlier neighbor) — the final
    row/column merge of the normal profile is simply skipped.
    Returns (left MP, left MPI, right MP, right MPI)."""
    return (
        pearson_to_euclidean(cols.value[:w], m),
        cols.index[:w].astype(jnp.int32),
        pearson_to_euclidean(rows.value[:w], m),
        rows.index[:w].astype(jnp.int32),
    )


def init_aggregates(length: int, dtype, init_value: float) -> Aggregates:
    return Aggregates(
        value=jnp.full((length,), init_value, dtype=dtype),
        index=jnp.full((length,), -1, dtype=jnp.int32),
    )
