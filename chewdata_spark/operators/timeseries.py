"""Time-series resampling: regular-grid gap fill with forward fill.

The hypertable/rollup idiom: bucket irregular events onto a fixed
interval grid per key, emit empty buckets explicitly, and carry the
last observed value across gaps.  All built-in functions:

- one (key, bucket) aggregation with map-side partials,
- per-key grids via ``sequence`` + ``explode`` (map-side, sized by the
  key's own time span, never a global calendar),
- forward fill as ``last(ignorenulls)`` over a per-key window — the
  partition key is the series key, so state per window is one key's
  grid, bounded by its span / interval.

At 100 TB the only shuffles are keyed by (key, bucket) / key — the
natural layout; no driver materialization, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def resample_forward_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    interval: str = "1 hour",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Resample each key's series onto a regular ``interval`` grid from
    its first to its last bucket; per bucket emit the event count and
    the last observed value, forward-filled through empty buckets.

    The per-bucket "last" is deterministic: ordered by (ts, tiebreak)
    via a struct max, so concurrent-timestamp events resolve stably.
    """
    bucket = F.date_trunc("hour", F.col(ts_col)) if interval == "1 hour" else None
    if bucket is None:
        raise ValueError(f"unsupported interval {interval!r} (extend the trunc map)")
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    per_bucket = (
        df.select(
            F.col(key_col).alias("key"),
            bucket.alias("bucket"),
            F.struct(*order, F.col(value_col).alias("v")).alias("ord"),
        )
        .groupBy("key", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("ord")["v"].alias("last_value"),
        )
    )
    spans = per_bucket.groupBy("key").agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = spans.select(
        "key",
        F.explode(F.sequence("b0", "b1", F.expr(f"INTERVAL {interval}"))).alias("bucket"),
    )
    joined = grid.join(per_bucket, ["key", "bucket"], "left")
    w = Window.partitionBy("key").orderBy("bucket")
    return joined.select(
        F.col("key").alias(key_col),
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("last_value", ignorenulls=True).over(w).alias("filled_value"),
    )


def sketch_quantiles(
    df,
    key_col: str,
    value_col: str,
    *,
    probs: tuple = (0.5, 0.95, 0.99),
    bins: int = 1024,
):
    """Mergeable bounded-state quantile estimation via an equal-width
    histogram sketch — the 100 TB scale path for every exact-percentile
    op here (winsorize / MAD / RFM edges): per-key state is ``bins``
    counters no matter how many rows a key has, and shards merge by
    adding counters.  Unlike t-digest/KLL the bin layout is a pure
    function of (min, max, bins), so the estimate is DETERMINISTIC and
    replayable in any SQL engine — the whole sketch is oracle-checkable.

    Plan: one per-key (min, max) aggregate broadcast back; one
    per-(key, bin) count; per-key cumulative over ≤``bins`` rows
    (bounded window partitions).  Estimate = left edge of the first bin
    whose cumulative count reaches p·n, linearly interpolated inside
    the bin by the fraction of that bin's count needed.  Returns one
    row per (key, p): ``(key, p, est, n)``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    vals = df.select(F.col(key_col).alias("key"), F.col(value_col).alias("v")).filter(
        F.col("v").isNotNull()
    )
    rng = vals.groupBy("key").agg(
        F.min("v").alias("_lo"), F.max("v").alias("_hi"), F.count(F.lit(1)).alias("n")
    )
    width = (F.col("_hi") - F.col("_lo")) / bins
    binned = (
        vals.join(F.broadcast(rng), "key")
        .withColumn(
            "b",
            # _hi == _lo guard: width 0 would make the ratio NaN and an
            # ANSI-mode NaN→int cast throws
            F.when(F.col("_hi") == F.col("_lo"), F.lit(0)).otherwise(
                F.least(
                    F.greatest(
                        F.floor((F.col("v") - F.col("_lo")) / width).cast("int"),
                        F.lit(0),
                    ),
                    F.lit(bins - 1),
                )
            ),
        )
        .groupBy("key", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("key").orderBy("b")
    cum = binned.withColumn("cum", F.sum("c").over(w)).join(F.broadcast(rng), "key")
    out = None
    for p in probs:
        target = F.lit(float(p)) * F.col("n")
        hit = (
            cum.filter(F.col("cum") >= target)
            .groupBy("key", "n", "_lo", "_hi")
            .agg(F.min("b").alias("b"))
            .join(binned, ["key", "b"])
            .join(
                cum.select("key", "b", F.col("cum").alias("cum_b")), ["key", "b"]
            )
        )
        # left edge + fraction of this bin's count needed to reach p·n
        est = (
            F.col("_lo")
            + (F.col("_hi") - F.col("_lo")) / bins
            * (
                F.col("b")
                + (target - (F.col("cum_b") - F.col("c"))) / F.col("c")
            )
        )
        row = hit.select(
            "key",
            F.lit(float(p)).alias("p"),
            F.round(est, 6).alias("est"),
            "n",
        )
        out = row if out is None else out.unionByName(row)
    return out
