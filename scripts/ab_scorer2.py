"""Interleaved A/B for the r16 scorer cap restructure (verdict item
3): OLD = the r15 shape (CAPPED seen checkpointed — its
materialization evaluates the explode+distinct subtree twice; salt
table semi-joins the capped relation's re-aggregated distinct
buckets) vs NEW = current HEAD (UNCAPPED seen checkpointed once; cap
filter + occupied-bucket set both derived from the bucket-grain
`sizes` relation).  Old and new alternate in ONE warmed JVM."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chewdata_spark.session import get_spark
from chewdata_spark.operators import suffix as S

NEW_NS = S._neighbour_scores


def r15_neighbour_scores(new_suf, seen_suf, *, max_bucket, unit, cap=256):
    from chewdata_spark.operators.dedup import _OBS_SEQ

    if max_bucket is not None:
        sizes = seen_suf.groupBy("_bk").agg(
            F.count(F.lit(1)).alias("_n")
        ).observe(
            f"sa_ingest_{next(_OBS_SEQ)}",
            F.sum(
                F.when(F.col("_n") > max_bucket, F.lit(1)).otherwise(F.lit(0))
            ).alias("dropped_hot_buckets"),
        )
        seen_suf = seen_suf.join(
            sizes.filter(F.col("_n") <= max_bucket).select("_bk"),
            "_bk", "left_semi",
        )
    seen_suf = seen_suf.localCheckpoint(eager=False)
    chunk = max_bucket if max_bucket is not None else 10_000
    salts_plain = (
        new_suf.groupBy("_bk")
        .agg(
            F.greatest(
                F.lit(1), F.ceil(F.count(F.lit(1)) / F.lit(chunk)),
            ).cast("int").alias("_ns")
        )
        .join(seen_suf.select("_bk").distinct(), "_bk", "left_semi")
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
    succ = F.first(seen_only, ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    return (
        u.withColumn("_pred", pred)
        .withColumn("_succ", succ)
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
    spark = get_spark("scorer2-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name):
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    for name in names:
        S._neighbour_scores = r15_neighbour_scores
        run(name)  # warmups
        S._neighbour_scores = NEW_NS
        run(name)
        olds, news = [], []
        for _ in range(3):
            S._neighbour_scores = r15_neighbour_scores
            spark.sparkContext.setJobDescription(f"{name} OLD(r15)")
            olds.append(run(name))
            S._neighbour_scores = NEW_NS
            spark.sparkContext.setJobDescription(f"{name} NEW(r16)")
            news.append(run(name))
        spark.catalog.clearCache()
        print(
            f"{name:40s} old={min(olds):7.2f}s new={min(news):7.2f}s "
            f"({min(olds)/min(news):4.2f}x)  raw old={[round(x,1) for x in olds]} "
            f"new={[round(x,1) for x in news]}",
            flush=True,
        )
    S._neighbour_scores = NEW_NS
    spark.stop()


if __name__ == "__main__":
    main()
