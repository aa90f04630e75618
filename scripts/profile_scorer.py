"""Sub-stage profile of sa_contamination_scores in the decontam
flagship shape (train = odd ids line-deduped, seen = even ids
normalized) — guide §1 measure-first for the scorer stage."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chewdata_spark.session import get_spark
from chewdata_spark.tables import load_table
from chewdata_spark.operators import dedup as D
from chewdata_spark.operators import suffix as S
from chewdata_spark.operators.text import normalize_text


def t(label, df, n=2):
    df.write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:54s} {best:7.2f}s", flush=True)
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scorer-profile")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 1)
    benchd = docs.filter(F.col("doc_id") % 2 == 0)
    norm = normalize_text(train, "doc_id", "text").select(
        "doc_id", F.col("norm_text").alias("text")
    )
    lined = (
        D.dedup_lines_global(norm, "doc_id", "text", min_words=5)
        .select("doc_id", F.col("clean_text").alias("text"))
        .localCheckpoint()
    )
    evaln = normalize_text(benchd, "doc_id", "text").select(
        "doc_id", F.col("norm_text").alias("text")
    ).localCheckpoint()

    max_chars, min_len, bucket_len, max_bucket = 64, 30, 8, 10_000

    def sufs(df):
        d = df.select("doc_id", F.coalesce("text", F.lit("")).alias("t")).filter(
            F.length("t") > 0
        )
        return d.select(
            "doc_id",
            F.explode(F.expr("sequence(1, length(t))")).alias("off"),
            "t",
        ).select(
            "doc_id",
            F.col("off").cast("int").alias("off"),
            F.expr(f"substring(t, off, {max_chars})").alias("suf"),
        )

    seen_raw = sufs(evaln).select("suf")
    t("a seen explode (no distinct)", seen_raw)
    seen_suf = seen_raw.distinct().withColumn(
        "_bk", F.substring("suf", 1, bucket_len)
    )
    t("b seen explode + distinct", seen_suf)
    sizes = seen_suf.groupBy("_bk").agg(F.count(F.lit(1)).alias("_n"))
    capped = seen_suf.join(
        sizes.filter(F.col("_n") <= max_bucket).select("_bk"), "_bk", "left_semi"
    )
    t("c capped seen (b + sizes + semi)", capped)
    bset = capped.select("_bk").distinct()
    t("d occupied-bucket set (c + distinct)", bset)

    new_suf = sufs(lined).withColumn("_bk", F.substring("suf", 1, bucket_len))
    t("e new explode", new_suf)
    filt = new_suf.join(bset, "_bk", "left_semi")
    t("f new semi-joined to buckets", filt)

    scored = S.sa_contamination_scores(
        lined, evaln, "doc_id", "text",
        max_chars=max_chars, min_len=min_len, bucket_len=bucket_len,
        max_bucket=max_bucket, full_doc=True,
    )
    t("g FULL scorer", scored)
    print("survivor arrivals:", filt.count(), "of", new_suf.count(),
          "| seen distinct:", seen_suf.count(), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
