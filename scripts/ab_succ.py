"""r16: is the scorer's succ frame quadratic?  Spark evaluates a
(x, unboundedFollowing) frame with UnboundedFollowingWindowFunctionFrame,
which RE-AGGREGATES from the current row to the partition end FOR EVERY
ROW — O(n^2) per (bucket, salt) partition, up to ~20k rows under the
cap + salting bounds.  The candidate fix computes succ as a RUNNING
(unboundedPreceding, -1) frame over the REVERSED row order (row_number
from the first pass, descending) — O(n), one reused exchange, one
extra int sort.

Arms alternate in ONE warmed JVM on the scorer-bound queries."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chewdata_spark.session import get_spark
from chewdata_spark.operators import suffix as S

CUR_NS = S._neighbour_scores


def linear_succ_neighbour_scores(new_suf, seen_suf, *, max_bucket, unit, cap=256):
    from chewdata_spark.operators.dedup import _OBS_SEQ

    seen_suf = seen_suf.localCheckpoint(eager=False)
    occupied = None
    if max_bucket is not None:
        sizes = seen_suf.groupBy("_bk").agg(
            F.count(F.lit(1)).alias("_n")
        ).observe(
            f"sa_ingest_{next(_OBS_SEQ)}",
            F.sum(
                F.when(F.col("_n") > max_bucket, F.lit(1)).otherwise(F.lit(0))
            ).alias("dropped_hot_buckets"),
        )
        occupied = sizes.filter(F.col("_n") <= max_bucket).select("_bk")
        seen_suf = seen_suf.join(occupied, "_bk", "left_semi")
    chunk = max_bucket if max_bucket is not None else 10_000
    if occupied is None:
        occupied = seen_suf.select("_bk").distinct()
    salts_plain = (
        new_suf.groupBy("_bk")
        .agg(
            F.greatest(
                F.lit(1), F.ceil(F.count(F.lit(1)) / F.lit(chunk)),
            ).cast("int").alias("_ns")
        )
        .join(occupied, "_bk", "left_semi")
        .localCheckpoint(eager=False)
    )
    salts_obs = salts_plain.observe(
        f"sa_arrivals_{next(_OBS_SEQ)}",
        F.sum(
            F.when(F.col("_ns") > 1, F.lit(1)).otherwise(F.lit(0))
        ).alias("salted_hot_arrival_buckets"),
    )
    seen_in = seen_suf.join(salts_obs, "_bk").select(
        F.lit(None).cast(new_suf.schema["doc_id"].dataType).alias("doc_id"),
        F.lit(None).cast("int").alias("off"),
        "suf", "_bk", F.lit(1).alias("_seen"),
        F.explode(F.expr("sequence(0, _ns - 1)")).alias("_salt"),
    )
    new_in = new_suf.join(salts_plain, "_bk").select(
        "doc_id", "off", "suf", "_bk", F.lit(0).alias("_seen"),
        F.pmod(F.xxhash64("doc_id", "off"), F.col("_ns")).cast("int").alias("_salt"),
    )
    u = new_in.unionByName(seen_in)
    w = Window.partitionBy("_bk", "_salt").orderBy("suf", F.col("_seen").desc())
    seen_only = F.when(F.col("_seen") == 1, F.col("suf"))
    pred = F.last(seen_only, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = u.withColumn("_pred", pred).withColumn(
        "_rn", F.row_number().over(w)
    )
    wrev = Window.partitionBy("_bk", "_salt").orderBy(F.col("_rn").desc())
    succ = F.last(
        F.when(F.col("_seen") == 1, F.col("suf")), ignorenulls=True
    ).over(wrev.rowsBetween(Window.unboundedPreceding, -1))
    return (
        staged.withColumn("_succ", succ)
        .filter(F.col("_seen") == 0)
        .select(
            "doc_id", "off",
            F.greatest(
                F.when(F.col("_pred").isNotNull(),
                       F.expr(S._lcp_sql(unit, b="_pred", cap=cap))).otherwise(0),
                F.when(F.col("_succ").isNotNull(),
                       F.expr(S._lcp_sql(unit, b="_succ", cap=cap))).otherwise(0),
            ).cast("int").alias("m"),
        )
    )


def main():
    sf_dir = "/root/testdata/sf0.1"
    names = sys.argv[1:] or [
        "curate_pipeline_decontam_sa",
        "decontaminate_cut_spans_sa_full",
        "dedup_incremental_ingest_sa",
    ]
    from chewdata_spark.queries import all_queries

    queries = all_queries()
    spark = get_spark("succ-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name):
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    for name in names:
        S._neighbour_scores = CUR_NS
        run(name)  # warmups
        S._neighbour_scores = linear_succ_neighbour_scores
        run(name)
        olds, news = [], []
        for _ in range(3):
            S._neighbour_scores = CUR_NS
            spark.sparkContext.setJobDescription(f"{name} QUADRATIC-SUCC")
            olds.append(run(name))
            S._neighbour_scores = linear_succ_neighbour_scores
            spark.sparkContext.setJobDescription(f"{name} LINEAR-SUCC")
            news.append(run(name))
        spark.catalog.clearCache()
        print(
            f"{name:40s} old={min(olds):7.2f}s new={min(news):7.2f}s "
            f"({min(olds)/min(news):4.2f}x)  raw old={[round(x,1) for x in olds]} "
            f"new={[round(x,1) for x in news]}",
            flush=True,
        )
    S._neighbour_scores = CUR_NS
    spark.stop()


if __name__ == "__main__":
    main()
