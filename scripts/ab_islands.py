"""Equality + interleaved A/B for the r15 _merge_islands single-pass
rewrite (island spans read off the window itself; the former
groupBy(doc_id, island) re-exchange disappears)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chewdata_spark.session import get_spark
from chewdata_spark.operators import suffix as S

NEW_MI = S._merge_islands


def old_merge_islands(marked):
    w = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    islands = marked.withColumn(
        "new_island",
        F.when(prev_max.isNull() | (F.col("s") > prev_max + 1), 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("s").cast("int").alias("span_start"),
            F.max("e").cast("int").alias("span_end"),
        )
        .drop("island")
    )


def main():
    sf_dir = "/root/testdata/sf0.1"
    from chewdata_spark.queries import all_queries

    queries = all_queries()
    spark = get_spark("islands-ab")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. equality: random interval relation incl. duplicates/touching
    marked = spark.range(200_000).select(
        (F.col("id") % 997).alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(5000)) + 1).alias("s"),
        (
            F.pmod(F.xxhash64("id"), F.lit(5000))
            + 1
            + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(80))
        ).alias("e"),
    )
    a = old_merge_islands(marked)
    b = NEW_MI(marked)
    d1, d2 = a.exceptAll(b).count(), b.exceptAll(a).count()
    print(f"equality synthetic: old\\new={d1} new\\old={d2} rows={b.count()}",
          flush=True)
    if d1 or d2:
        sys.exit(1)

    # 2. interleaved A/B over island-heavy queries
    def run(name):
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    for name in sys.argv[1:] or [
        "dedup_cut_spans_sa_full",
        "documents_repeat_spans_full",
        "curate_pipeline_decontam_sa",
    ]:
        S._merge_islands = old_merge_islands
        run(name)  # warmups
        S._merge_islands = NEW_MI
        run(name)
        olds, news = [], []
        for _ in range(2):
            S._merge_islands = old_merge_islands
            spark.sparkContext.setJobDescription(f"{name} OLD")
            olds.append(run(name))
            S._merge_islands = NEW_MI
            spark.sparkContext.setJobDescription(f"{name} NEW")
            news.append(run(name))
        print(
            f"{name:40s} old={min(olds):7.2f}s new={min(news):7.2f}s "
            f"({min(olds)/min(news):4.2f}x)  raw old={[round(x,1) for x in olds]} "
            f"new={[round(x,1) for x in news]}",
            flush=True,
        )
    S._merge_islands = NEW_MI
    spark.stop()


if __name__ == "__main__":
    main()
