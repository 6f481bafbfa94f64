from mpx.ops.precompute import precompute_statistics, precompute_statistics_numpy
from mpx.ops.aggregates import (
    merge_aggregates,
    pearson_to_euclidean,
    postcompute,
)

__all__ = [
    "precompute_statistics",
    "precompute_statistics_numpy",
    "merge_aggregates",
    "pearson_to_euclidean",
    "postcompute",
]
