"""Fine split of the _group_dup_lengths stage: rep-suffix build vs
self-join vs LCP evaluation vs a single threshold prefix-compare."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chewdata_spark.session import get_spark
from chewdata_spark.tables import load_table
from chewdata_spark.operators import dedup as D
from chewdata_spark.operators.text import normalize_text
from chewdata_spark.operators.suffix import (
    _char_ranks,
    _lcp_sql,
    _rep_suffixes,
    _tiled_docs,
)


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
    spark = get_spark("lcp-stage-profile")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    norm = normalize_text(docs, "doc_id", "text").select(
        "doc_id", F.col("norm_text").alias("text")
    )
    lined = (
        D.dedup_lines_global(norm, "doc_id", "text", min_words=5)
        .select("doc_id", F.col("clean_text").alias("text"))
        .localCheckpoint()
    )
    tile, min_len = 128, 30
    stride = tile - (min_len - 1)
    wdocs = _tiled_docs(lined, "doc_id", "text", tile, stride).localCheckpoint()
    print("windows:", wdocs.count(), flush=True)
    ranks = _char_ranks(wdocs, tile).localCheckpoint()
    print("positions:", ranks.count(), flush=True)

    t(spark, "rep_suffixes build", _rep_suffixes(ranks, wdocs, "char", tile))
    suf = _rep_suffixes(ranks, wdocs, "char", tile).localCheckpoint()
    print("rank groups:", suf.count(), flush=True)

    nxt = suf.select(F.col("rank").alias("_rk2"), F.col("suf").alias("suf2"))
    joined = suf.join(nxt, (F.col("rank") + F.col("m")) == F.col("_rk2"), "left")

    t(spark, "self-join only (no LCP)", joined.select("rank", "m", F.length("suf").alias("x")))
    t(
        spark,
        "self-join + binary LCP",
        joined.select(
            "rank", "m",
            F.coalesce(F.expr(_lcp_sql("char", cap=tile)), F.lit(0)).alias("l"),
        ),
    )
    t(
        spark,
        "self-join + 30-prefix eq",
        joined.select(
            "rank", "m",
            (
                (F.length("suf") >= min_len)
                & (F.substring("suf", 1, min_len) == F.substring("suf2", 1, min_len))
            ).alias("d"),
        ),
    )
    # join back of (rank -> flag/len) onto positions
    gd = joined.select(
        "rank",
        F.coalesce(F.expr(_lcp_sql("char", cap=tile)), F.lit(0)).alias("dup_len"),
    )
    t(spark, "join back to positions (after binary LCP)", ranks.join(gd, "rank"))
    spark.stop()


if __name__ == "__main__":
    main()
