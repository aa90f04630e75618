"""Stage-isolated interleaved A/B for the r15 `_adjacent_pairs`
rewrite: times _position_dup_lengths + islands over ONE fixed,
eagerly-checkpointed ranks relation, alternating the old self-join
`_group_dup_lengths` (verbatim from commit 96caf9a, via
scripts/check_pairs_eq.py) with the new single-groupBy pairing in the
same warmed JVM, so host drift and JIT state cancel."""

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
from scripts.check_pairs_eq import old_group_dup_lengths

NEW_GDL = S._group_dup_lengths


def main():
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("pairs-stage-ab")
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
    wdocs = S._tiled_docs(lined, "doc_id", "text", tile, stride).localCheckpoint()
    ranks = S._char_ranks(wdocs, tile).localCheckpoint()
    print("ranks rows:", ranks.count(), flush=True)

    base = (F.col("doc_id.w") - 1) * stride + F.col("off")

    def pipeline():
        posd = S._position_dup_lengths(ranks, wdocs, "char", tile)
        marked = posd.filter(F.col("dup_len") >= min_len).select(
            F.col("doc_id.d").alias("doc_id"),
            base.alias("s"),
            (base + F.col("dup_len") - 1).alias("e"),
        )
        return S._merge_islands(marked)

    def run():
        t0 = time.perf_counter()
        pipeline().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def set_old():
        S._group_dup_lengths = old_group_dup_lengths

    def set_new():
        S._group_dup_lengths = NEW_GDL

    set_old(); run()  # warmups
    set_new(); run()
    olds, news = [], []
    for _ in range(3):
        set_old(); olds.append(run())
        set_new(); news.append(run())
    print(
        f"marks+islands stage  old={min(olds):6.2f}s new={min(news):6.2f}s "
        f"({min(olds)/min(news):4.2f}x)  raw old={[round(x,1) for x in olds]} "
        f"new={[round(x,1) for x in news]}",
        flush=True,
    )
    # row-level equality over the fixed ranks
    set_old(); a = pipeline()
    set_new(); b = pipeline()
    bad = a.exceptAll(b).count() + b.exceptAll(a).count()
    print("island mismatches:", bad, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
