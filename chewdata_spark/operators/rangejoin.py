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
    """
    lb = F.floor(F.col(left_val) / max_distance).alias("_bin")
    l_binned = left.withColumn("_bin", lb)
    r_binned = right.withColumn(
        "_bin",
        F.explode(
            F.array(
                F.floor(F.col(right_val) / max_distance) - 1,
                F.floor(F.col(right_val) / max_distance),
                F.floor(F.col(right_val) / max_distance) + 1,
            )
        ),
    )
    joined = l_binned.join(r_binned, "_bin", how)
    exact = F.abs(F.col(left_val) - F.col(right_val)) <= max_distance
    return joined.filter(exact).drop("_bin")
