"""Skew mitigation + shuffle-elimination helpers.

AQE's skew-join splitting handles most hot keys automatically (enabled
in session.py), but two patterns still need explicit help at 100 TB:

- **Salted two-phase aggregation**: a groupBy where one key holds a
  double-digit percent of all rows bottlenecks its single reducer.
  Salting splits each key across ``num_salts`` partial groups, then
  re-aggregates — pure algebraic regrouping for decomposable aggregates
  (sum/count/min/max), so results are identical.
- **Salted join**: replicate the small side per salt so a skewed left
  key spreads over ``num_salts`` reducers.
- **Bucketed co-located joins**: pre-bucketing both fact tables on the
  join key removes the per-query shuffle entirely (the scan is already
  hash-partitioned).  Bucket at write time once, join shuffle-free
  forever.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value_cols: dict[str, str],
    *,
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``value_cols`` maps output name → one of sum/count/min/max over a
    column, e.g. ``{"total": "sum:amount", "n": "count:*"}``.
    Phase 1 aggregates on (keys, salt); phase 2 merges per key.
    """
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()), F.lit(num_salts))
    phase1_aggs, phase2_aggs = [], []
    for out, spec in value_cols.items():
        op, _, col = spec.partition(":")
        if op == "sum":
            phase1_aggs.append(F.sum(col).alias(out))
            phase2_aggs.append(F.sum(out).alias(out))
        elif op == "count":
            phase1_aggs.append(F.count(F.lit(1) if col in ("*", "") else F.col(col)).alias(out))
            phase2_aggs.append(F.sum(out).alias(out))
        elif op == "min":
            phase1_aggs.append(F.min(col).alias(out))
            phase2_aggs.append(F.min(out).alias(out))
        elif op == "max":
            phase1_aggs.append(F.max(col).alias(out))
            phase2_aggs.append(F.max(out).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate {op!r}")
    partial = df.withColumn(SALT_COL, salt).groupBy(*keys, SALT_COL).agg(*phase1_aggs)
    return partial.groupBy(*keys).agg(*phase2_aggs)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    *,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skew-keyed big side against a modest side by salting:
    big rows get a deterministic salt, the small side is replicated
    once per salt value (explode, map-side) — each hot key spreads over
    ``num_salts`` reducers.  Use when the small side is too big to
    broadcast but the big side has hot keys AQE misses."""
    salt_big = F.pmod(F.xxhash64(F.col(on), F.monotonically_increasing_id()), F.lit(num_salts))
    big = skewed.withColumn(SALT_COL, salt_big)
    rep = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<long>"))
    )
    return big.join(rep, [on, SALT_COL], how).drop(SALT_COL)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    *,
    num_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist hash-bucketed by the join key: subsequent equi-joins and
    aggregations on that key read pre-partitioned data — no exchange."""
    (
        df.write.mode(mode)
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(spark: SparkSession, table_a: str, table_b: str, on: Column | str) -> DataFrame:
    """Join two same-bucketed tables (shuffle-free when bucket specs match)."""
    return spark.table(table_a).join(spark.table(table_b), on)


def write_compacted(
    df: DataFrame,
    path: str,
    *,
    fmt: str = "parquet",
    target_file_mb: int = 256,
    mode: str = "overwrite",
    options: dict[str, str] | None = None,
) -> int:
    """Small-files-safe write: size the output file count from the
    OPTIMIZER'S size estimate instead of inheriting upstream partition
    count.  A 100 TB pipeline that writes a filtered/aggregated result
    through its input partitioning produces millions of KB-sized files
    (the classic small-files problem) or a handful of multi-GB ones;
    this picks ``ceil(estimated_bytes / target_file_mb)`` partitions.

    Returns the partition count used.  The estimate comes from Catalyst
    statistics (``optimizedPlan().stats``) — free, no extra scan; for
    severely mis-estimated plans pass an explicit repartition upstream.
    """
    from chewdata_spark.sources.documents import write_document

    est_bytes = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    n = max(1, -(-est_bytes // (target_file_mb * 1024 * 1024)))
    write_document(df.repartition(n), path, fmt, mode=mode, options=options)
    return n
