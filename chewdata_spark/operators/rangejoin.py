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

import functools
import operator as _op
from typing import Sequence

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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Sequence[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    grid: str = "month",
) -> DataFrame:
    """All (left, right) pairs sharing every ``on`` key whose date
    intervals overlap: ``left_start <= right_end AND right_start <=
    left_end``.  Inner join only.

    Same device as :func:`banded_range_join`, lifted to intervals:
    each side explodes its NORMALIZED span (``least(s,e)`` ..
    ``greatest(s,e)`` — inverted intervals are normalized so the grid
    stays lossless) into calendar-``grid`` cells, the sides equi-join
    on ``(on..., cell)``, and the **first-shared-cell predicate**
    ``cell == greatest(left_first_cell, right_first_cell)`` makes each
    qualifying pair meet in EXACTLY ONE cell — no post-join
    ``dropDuplicates`` (a full extra shuffle on the pair output, and a
    correctness trap when the dedup key is not a row identity).  The
    exact raw-orientation overlap predicate re-verifies inside the
    join, so grid fan-out only costs candidate work, never wrong rows.

    The normalized grid provably covers the raw predicate:
    ``least(a) <= a.s <= b.e <= greatest(b)`` and symmetrically, so
    two raw-overlapping intervals always share a normalized cell.

    Non-key column names must be disjoint between the sides (alias
    first); a shared non-key name raises ``ValueError`` — tightened
    from earlier releases, which silently emitted duplicate-named
    output columns that broke on the first downstream select.  ``on``
    keys are emitted once.  ``grid`` is any
    ``trunc``/INTERVAL unit — ``month`` (default), ``quarter``,
    ``year``, ``week``: wider cells shrink the explode fan-out but
    densify per-cell candidate pairs; pick by span length / key
    cardinality.  Scale shape: ONE hash shuffle on ``(on, cell)``,
    output rows == qualifying pairs, never |left|x|right|.
    """
    steps = {
        "month": "interval 1 month",
        "quarter": "interval 3 month",
        "year": "interval 1 year",
        "week": "interval 7 day",
    }
    if grid not in steps:
        raise ValueError(f"grid must be one of {sorted(steps)}, got {grid!r}")
    reserved = {"_iv_l0", "_iv_lc", "_iv_r0", "_iv_rc"}
    clash = reserved & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"reserved internal column name(s) {sorted(clash)} already "
            "present in an input — rename them before joining (withColumn "
            "would silently overwrite and emit grid cells under your name)"
        )
    shared = (set(left.columns) & set(right.columns)) - set(on)
    if shared:
        raise ValueError(
            f"non-key columns {sorted(shared)} appear on BOTH sides — "
            "alias them first; only the `on` keys may be shared (duplicate "
            "names would surface later as ambiguous output columns)"
        )
    lc0 = F.trunc(F.least(left_start, left_end), grid)
    lc1 = F.trunc(F.greatest(left_start, left_end), grid)
    rc0 = F.trunc(F.least(right_start, right_end), grid)
    rc1 = F.trunc(F.greatest(right_start, right_end), grid)
    step = F.expr(steps[grid])
    L = (
        left.withColumn("_iv_l0", lc0)
        .withColumn("_iv_lc", F.explode(F.sequence(lc0, lc1, step)))
        .alias("_ivL")
    )
    R = (
        right.withColumn("_iv_r0", rc0)
        .withColumn("_iv_rc", F.explode(F.sequence(rc0, rc1, step)))
        .alias("_ivR")
    )
    cond = functools.reduce(
        _op.and_,
        [F.col(f"_ivL.{k}") == F.col(f"_ivR.{k}") for k in on],
    )
    cond = (
        cond
        & (F.col("_ivL._iv_lc") == F.col("_ivR._iv_rc"))
        & (
            F.col("_ivL._iv_lc")
            == F.greatest(F.col("_ivL._iv_l0"), F.col("_ivR._iv_r0"))
        )
        & (F.col(f"_ivL.{left_start}") <= F.col(f"_ivR.{right_end}"))
        & (F.col(f"_ivR.{right_start}") <= F.col(f"_ivL.{left_end}"))
    )
    joined = L.join(R, cond, "inner")
    keep = [F.col(f"_ivL.{k}").alias(k) for k in on]
    keep += [
        F.col(f"_ivL.{c}")
        for c in left.columns
        if c not in on
    ]
    keep += [
        F.col(f"_ivR.{c}")
        for c in right.columns
        if c not in on
    ]
    return joined.select(*keep)
