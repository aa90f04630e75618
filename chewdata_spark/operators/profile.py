"""Single-pass data profiling — the pre-training corpus health check.

One aggregate over the table computes every column's null rate,
distinct count, and min/max; the wide 1-row result unpivots to
long form with ``stack`` (all JVM-side, no Python).  Map-side partial
aggregation means the pass is scan-bound at any scale.

``exact_distinct=False`` (default) uses HyperLogLog
(approx_count_distinct, one pass, mergeable sketches — the 100 TB
setting); ``True`` uses exact COUNT(DISTINCT) (Catalyst Expand — one
shuffle per distinct column set, oracle-comparable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame, columns: list[str] | None = None, *, exact_distinct: bool = False
) -> DataFrame:
    """Per-column stats in long form:
    (column, n_nonnull, n_distinct, null_rate, min_str, max_str)."""
    cols = columns or df.columns
    distinct = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__total")]
    for c in cols:
        col = F.col(c)
        s = col.cast("string")
        aggs += [
            F.count(col).alias(f"{c}__n"),
            distinct(col).alias(f"{c}__d"),
            F.min(s).alias(f"{c}__min"),
            F.max(s).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__n`, `{c}__d`, `{c}__min`, `{c}__max`" for c in cols
    )
    long = wide.selectExpr(
        "__total",
        f"stack({len(cols)}, {stack_args}) AS (column, n_nonnull, n_distinct, min_str, max_str)",
    )
    return long.select(
        "column",
        "n_nonnull",
        "n_distinct",
        F.round(F.lit(1) - F.col("n_nonnull") / F.col("__total"), 4).alias("null_rate"),
        "min_str",
        "max_str",
    )
