"""Stage-isolated interleaved A/B for the _merge_islands rewrite: one
FIXED eagerly-checkpointed marks relation (the dedup_cut_spans_sa_full
shape at sf0.1), then old/new island merges alternate over it many
times — per-run cost is seconds, so the min-of-N is noise-robust, and
the only difference between sides is the islands stage itself."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chewdata_spark.session import get_spark
from chewdata_spark.tables import load_table
from chewdata_spark.operators import suffix as S
from scripts.ab_islands import old_merge_islands

NEW_MI = S._merge_islands


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("islands-stage-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    tile, min_len = 128, 30
    stride = tile - (min_len - 1)
    wdocs = S._tiled_docs(docs, "doc_id", "text", tile, stride)
    ranks = S._char_ranks(wdocs, tile)
    pos = S._position_dup_lengths(ranks, wdocs, "char", tile)
    base = (F.col("doc_id.w") - 1) * stride + F.col("off")
    marked = pos.filter(F.col("dup_len") >= min_len).select(
        F.col("doc_id.d").alias("doc_id"),
        base.alias("s"),
        (base + F.col("dup_len") - 1).alias("e"),
    ).localCheckpoint()  # eager: the stage input is FIXED for both sides
    print("marks rows:", marked.count(), flush=True)

    a = old_merge_islands(marked)
    b = NEW_MI(marked)
    d1, d2 = a.exceptAll(b).count(), b.exceptAll(a).count()
    print(f"equality corpus: old\\new={d1} new\\old={d2} rows={b.count()}",
          flush=True)

    def t(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    t(a); t(b)  # warm
    olds, news = [], []
    for _ in range(reps):
        olds.append(t(old_merge_islands(marked)))
        news.append(t(NEW_MI(marked)))
    print(
        f"islands stage: old={min(olds):6.2f}s new={min(news):6.2f}s "
        f"({min(olds)/min(news):4.2f}x)  raw old={[round(x,2) for x in olds]} "
        f"new={[round(x,2) for x in news]}",
        flush=True,
    )
    spark.stop()
    sys.exit(1 if d1 or d2 else 0)


if __name__ == "__main__":
    main()
