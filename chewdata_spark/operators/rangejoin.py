"""Banded (binned) range join.

A non-equi join ``|L.x - R.y| <= d`` naively plans as a nested-loop
cross product — quadratic and cluster-hostile.  The banded form bins
both sides at width ``d``, replicates one side into its neighboring
bins (map-side explode, 3x), equi-joins on the bin id (hash shuffle,
AQE-skew-safe), and applies the exact predicate after.  Each matching
pair meets in exactly one replicated bin, so no dedup is needed.

This is the standard distributed pattern for range/interval joins
(same trick spatial engines use for distance joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    *,
    max_distance: float,
    how: str = "inner",
) -> DataFrame:
    """All (left, right) pairs with ``|left_val - right_val| <= max_distance``.

    Column name collisions are the caller's to avoid (alias first).

    ``how`` may be ``inner`` or ``left``/``left_outer``: the left side
    lands in exactly one bin, so null-extension is correct; the right
    side is replicated 3x, so right/full outer would triplicate
    unmatched right rows and are rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"banded_range_join supports how='inner'/'left' only, got {how!r} "
            "(right side is bin-replicated; right/full outer would duplicate rows)"
        )
    l_binned = left.withColumn("_lbin", F.floor(F.col(left_val) / max_distance))
    r_binned = right.withColumn(
        "_rbin",
        F.explode(
            F.array(
                F.floor(F.col(right_val) / max_distance) - 1,
                F.floor(F.col(right_val) / max_distance),
                F.floor(F.col(right_val) / max_distance) + 1,
            )
        ),
    )
    # exact predicate lives IN the join condition so outer rows
    # null-extend instead of being dropped by a post-filter
    cond = (F.col("_lbin") == F.col("_rbin")) & (
        F.abs(F.col(left_val) - F.col(right_val)) <= max_distance
    )
    return l_binned.join(r_binned, cond, how).drop("_lbin", "_rbin")
