"""In-session interleaved A/B for the r15 rank-build rewrite (32-char
base grams + fused group-size window) — monkeypatches the OLD
_char_ranks/_prefix_double back in for the A side."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chewdata_spark.session import get_spark
from chewdata_spark.operators import suffix as S

NEW_CHAR_RANKS = S._char_ranks
NEW_PREFIX_DOUBLE = S._prefix_double


def old_prefix_double(work, max_units, *, h0=1):
    work = work.localCheckpoint()
    if h0 >= max_units:
        return work
    frozen = []
    h = h0
    grp_w = Window.partitionBy("rank").orderBy("nxt")
    while h < max_units:
        sized = work.withColumn(
            "_m", F.count(F.lit(1)).over(Window.partitionBy("rank"))
        ).localCheckpoint()
        still = sized.filter(F.col("_m") >= 2).drop("_m")
        done = sized.filter(F.col("_m") == 1).drop("_m")
        frozen.append(done)
        if still.isEmpty():
            work = None
            break
        full = still
        for piece in frozen:
            full = full.unionByName(piece)
        lookup = full.select(
            "doc_id", (F.col("off") - h).alias("off"), F.col("rank").alias("nxt")
        ).filter(F.col("off") >= 1)
        work = (
            still.join(lookup, ["doc_id", "off"], "left")
            .withColumn("nxt", F.coalesce("nxt", F.lit(0)))
            .select(
                "doc_id", "off",
                (F.col("rank") + F.rank().over(grp_w) - 1).alias("rank"),
            )
            .localCheckpoint()
        )
        h *= 2
    out = frozen[0]
    for piece in frozen[1:]:
        out = out.unionByName(piece)
    if work is not None:
        out = out.unionByName(work)
    return out


def old_char_ranks(docs, max_chars):
    pos = (
        docs.select(
            "doc_id",
            F.explode(F.expr("sequence(1, length(t))")).alias("off"),
            "t",
        ).select("doc_id", "off", F.expr("substring(t, off, 8)").alias("g8"))
    )
    return old_prefix_double(
        S._two_level_base_ranks(
            pos, "g8", bucket=F.substring("g8", 1, 4),
            bucket2=F.substring(F.col("_bk"), 1, 2),
        ),
        max_chars,
        h0=8,
    )


def main():
    sf_dir = "/root/testdata/sf0.1"
    names = sys.argv[1:] or [
        "dedup_cut_spans_sa_full",
        "curate_pipeline_full_sa",
        "curate_pipeline_decontam_sa",
    ]
    from chewdata_spark.queries import all_queries

    queries = all_queries()
    spark = get_spark("loop-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name):
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    def set_old():
        S._char_ranks = old_char_ranks
        S._prefix_double = old_prefix_double

    def set_new():
        S._char_ranks = NEW_CHAR_RANKS
        S._prefix_double = NEW_PREFIX_DOUBLE

    for name in names:
        set_old(); run(name)  # warmups
        set_new(); run(name)
        olds, news = [], []
        for _ in range(2):
            set_old()
            spark.sparkContext.setJobDescription(f"{name} OLD")
            olds.append(run(name))
            set_new()
            spark.sparkContext.setJobDescription(f"{name} NEW")
            news.append(run(name))
        spark.catalog.clearCache()
        print(
            f"{name:40s} old={min(olds):7.2f}s new={min(news):7.2f}s "
            f"({min(olds)/min(news):4.2f}x)  raw old={[round(x,1) for x in olds]} "
            f"new={[round(x,1) for x in news]}",
            flush=True,
        )
    set_new()
    spark.stop()


if __name__ == "__main__":
    main()
