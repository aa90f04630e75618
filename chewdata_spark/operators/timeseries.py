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
