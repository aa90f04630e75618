"""Fine split of sa_contamination_scores (full_doc char grain) — the
decontam flagships' second-heaviest stage."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chewdata_spark.session import get_spark
from chewdata_spark.tables import load_table
from chewdata_spark.operators import dedup as D
from chewdata_spark.operators.text import normalize_text
from chewdata_spark.operators import suffix as S


def t(spark, label, df, n=2):
    spark.sparkContext.setJobDescription(label)
    df.write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(n):
        s = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - s)
    print(f"{label:55s} {best:8.2f}s", flush=True)
    return best


def main():
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("scores-profile")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 1)
    bench = docs.filter(F.col("doc_id") % 2 == 0)
    norm = normalize_text(train, "doc_id", "text").select(
        "doc_id", F.col("norm_text").alias("text")
    )
    lined = (
        D.dedup_lines_global(norm, "doc_id", "text", min_words=5)
        .select("doc_id", F.col("clean_text").alias("text"))
        .localCheckpoint()
    )
    evaln = normalize_text(bench, "doc_id", "text").select(
        "doc_id", F.col("norm_text").alias("text")
    ).localCheckpoint()

    max_chars, min_len, bucket_len, max_bucket = 64, 30, 8, 10_000

    def _sufs(df):
        docs_ = df.select("doc_id", F.coalesce("text", F.lit("")).alias("t")).filter(
            F.length("t") > 0
        )
        return docs_.select(
            "doc_id",
            F.explode(F.expr("sequence(1, length(t))")).alias("off"),
            "t",
        ).select(
            "doc_id",
            F.col("off").cast("int").alias("off"),
            F.expr(f"substring(t, off, {max_chars})").alias("suf"),
        )

    new_suf = _sufs(lined).withColumn("_bk", F.substring("suf", 1, bucket_len))
    seen_raw = _sufs(evaln)
    t(spark, "1 new-side explode+suf+bk", new_suf)
    t(spark, "2 seen-side explode", seen_raw)
    seen_suf = seen_raw.select("suf").distinct().withColumn(
        "_bk", F.substring("suf", 1, bucket_len)
    )
    t(spark, "3 seen distinct+bk", seen_suf)
    seen_ck = seen_suf.localCheckpoint()
    new_ck = new_suf.localCheckpoint()
    print("new positions:", new_ck.count(), " seen distinct:", seen_ck.count(), flush=True)

    sizes = seen_ck.groupBy("_bk").agg(F.count(F.lit(1)).alias("_n"))
    capped = seen_ck.join(
        sizes.filter(F.col("_n") <= max_bucket).select("_bk"), "_bk", "left_semi"
    )
    t(spark, "4 cap semi-join (seen)", capped)
    pre = new_ck.join(capped.select("_bk").distinct(), "_bk", "left_semi")
    t(spark, "5 arrival prefilter semi-join", pre)
    print("prefiltered arrivals:", pre.count(), flush=True)

    full = S._neighbour_scores(
        new_ck, seen_ck, max_bucket=max_bucket, unit="char", cap=max_chars
    )
    t(spark, "6 full _neighbour_scores", full)
    spark.stop()


if __name__ == "__main__":
    main()
