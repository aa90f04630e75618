"""As-of join: match each left row to the latest right row at-or-before
its timestamp (per key).

Spark has no native as-of join; this is the composition-of-built-ins
strategy (option (a) in the custom-operator ladder): union the two
sides tagged, sort within key, and carry the most recent right payload
forward with ``last(..., ignorenulls=True)`` over an unbounded-preceding
window.  One shuffle on (key) — same cost as a regular join — no
Python, no range-explosion.

A tolerance bound ("match only if within N seconds") filters after the
carry-forward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    tolerance_sec: int | None = None,
    right_cols: list[str] | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right_ts <= left_ts`` and the same ``on`` key (NULLs if none).

    Ties on timestamp prefer the right row (it "happened first" in the
    union ordering), matching pandas ``merge_asof`` semantics.  When
    multiple right rows share (key, ts), ``right_tiebreak`` makes the
    pick deterministic (max tiebreak wins).
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    l_tagged = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    r_payload = F.struct(F.col(right_ts).alias("_rts"), *[F.col(c) for c in right_cols])
    tb = F.col(right_tiebreak) if right_tiebreak else F.lit(0)
    r_tagged = (
        right.withColumn("_side", F.lit(0))
        .withColumn("_ts", F.col(right_ts))
        .withColumn("_payload", r_payload)
        .withColumn("_tb", tb)
        .select(on, "_side", "_ts", "_payload", "_tb")
    )
    unioned = l_tagged.withColumn(
        "_payload", F.lit(None).cast(r_tagged.schema["_payload"].dataType)
    ).withColumn("_tb", F.lit(None).cast(r_tagged.schema["_tb"].dataType)).unionByName(
        r_tagged, allowMissingColumns=True
    )
    w = Window.partitionBy(on).orderBy(
        F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc_nulls_first()
    ).rowsBetween(Window.unboundedPreceding, 0)
    carried = unioned.withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1)
    if tolerance_sec is not None:
        in_range = (
            F.col("_match").isNotNull()
            & (F.unix_timestamp("_ts") - F.unix_timestamp("_match._rts") <= tolerance_sec)
        )
        out = out.withColumn("_match", F.when(in_range, F.col("_match")))
    for c in right_cols:
        out = out.withColumn(c, F.col("_match").getField(c))
    out = out.withColumn("matched_ts", F.col("_match").getField("_rts"))
    return out.drop("_side", "_ts", "_payload", "_match", "_tb")
