"""Stage-split profiler for the SA flagship family (guide §1: measure
first).  Materializes each pipeline stage with the noop sink and times
it separately, so the round's optimization targets are evidence-backed.

Usage: python scripts/profile_sa.py [sf_dir]
"""

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
    _group_dup_lengths,
    _merge_islands,
    _position_dup_lengths,
    _rep_suffixes,
    _tiled_docs,
    _two_level_base_ranks,
    sa_contamination_scores,
)


def t(label, df, n=1):
    spark = df.sparkSession
    spark.sparkContext.setJobDescription(label)
    best = float("inf")
    for _ in range(n + 1):  # first run is warmup
        start = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - start
        best = min(best, el)
    print(f"{label:50s} {best:8.2f}s", flush=True)
    spark.sparkContext.setJobDescription(None)
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("sa-profile")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 1)
    bench = docs.filter(F.col("doc_id") % 2 == 0)

    norm = normalize_text(train, "doc_id", "text").select(
        "doc_id", F.col("norm_text").alias("text")
    )
    t("1 normalize", norm)
    lined_lazy = D.dedup_lines_global(norm, "doc_id", "text", min_words=5).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    t("2 normalize+line-dedup", lined_lazy)
    lined = lined_lazy.localCheckpoint()  # eager: paid once, excluded below

    tile, min_len = 128, 30
    stride = tile - (min_len - 1)
    wdocs = _tiled_docs(lined, "doc_id", "text", tile, stride)
    t("3 tiled docs", wdocs)

    pos = (
        wdocs.select(
            "doc_id",
            F.explode(F.expr("sequence(1, length(t))")).alias("off"),
            "t",
        )
        .select("doc_id", "off", F.expr("substring(t, off, 8)").alias("g8"))
    )
    t("4 position explode (g8)", pos)
    base = _two_level_base_ranks(
        pos, "g8", bucket=F.substring("g8", 1, 4),
        bucket2=F.substring(F.col("_bk"), 1, 2),
    )
    t("5 base ranks (3-level prefix sum)", base)

    ranks = _char_ranks(wdocs, tile)
    t("6 full ranks (base + doubling loop)", ranks)

    ranks_ck = ranks.localCheckpoint()
    suf = _rep_suffixes(ranks_ck, wdocs, "char", tile)
    t("7 rep suffixes (groupBy rank + corpus join)", suf)
    gd = _group_dup_lengths(suf, "char")
    t("8 group dup lengths (adjacent LCP)", gd)
    posd = _position_dup_lengths(ranks_ck, wdocs, "char", tile)
    t("9 position dup lengths (7+8+join back)", posd)

    basecol = (F.col("doc_id.w") - 1) * stride + F.col("off")
    marked = posd.filter(F.col("dup_len") >= min_len).select(
        F.col("doc_id.d").alias("doc_id"),
        basecol.alias("s"),
        (basecol + F.col("dup_len") - 1).alias("e"),
    )
    t("10 islands (marks + merge)", _merge_islands(marked))

    scored = sa_contamination_scores(
        lined, bench.selectExpr("doc_id", "text"), "doc_id", "text",
        max_chars=64, min_len=30, bucket_len=8, max_bucket=10_000,
        full_doc=True,
    )
    t("11 contamination scores (full_doc)", scored)

    spark.stop()


if __name__ == "__main__":
    main()
