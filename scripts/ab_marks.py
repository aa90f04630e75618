"""In-session interleaved A/B for the r15 marks-stage restructure
(m carried out of the doubling loop + singleton-bypass _rep_suffixes +
single-LCP pair-explode _group_dup_lengths) — monkeypatches the OLD
implementations back in for the A side.  The old functions work
unchanged on the new m-carrying ranks relation (the extra column is
ignored by their groupBy/select)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chewdata_spark.session import get_spark
from chewdata_spark.operators import suffix as S

NEW_REP = S._rep_suffixes
NEW_GDL = S._group_dup_lengths


def old_rep_suffixes(ranks, corpus, unit, max_units):
    rep = ranks.groupBy("rank").agg(
        F.min(F.struct("doc_id", "off")).alias("p"),
        F.count(F.lit(1)).alias("m"),
    )
    sliced = (
        F.expr(f"substring(t, off, {max_units})")
        if unit == "char"
        else F.expr(f"slice(toks, off, {max_units})")
    )
    return (
        rep.select("rank", "m", F.col("p.doc_id").alias("doc_id"),
                   F.col("p.off").alias("off"))
        .join(corpus, "doc_id")
        .select("rank", "m", sliced.alias("suf"))
    )


def old_group_dup_lengths(suf, unit, cap=256):
    size = F.length if unit == "char" else F.size
    nxt = suf.select(F.col("rank").alias("_rk2"), F.col("suf").alias("suf2"))
    lcp = F.expr(S._lcp_sql(unit, cap=cap))
    l_next = (
        suf.join(nxt, (F.col("rank") + F.col("m")) == F.col("_rk2"), "left")
        .select(
            "rank", "m", size("suf").alias("slen"),
            F.coalesce(lcp, F.lit(0)).alias("l_next"),
        )
    )
    l_prev = l_next.select(
        (F.col("rank") + F.col("m")).alias("rank"),
        F.col("l_next").alias("l_prev"),
    )
    return l_next.join(l_prev, "rank", "left").select(
        "rank",
        F.greatest(
            F.when(F.col("m") >= 2, F.col("slen")).otherwise(0),
            F.col("l_next"),
            F.coalesce("l_prev", F.lit(0)),
        ).alias("dup_len"),
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
    spark = get_spark("marks-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name):
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    def set_old():
        S._rep_suffixes = old_rep_suffixes
        S._group_dup_lengths = old_group_dup_lengths

    def set_new():
        S._rep_suffixes = NEW_REP
        S._group_dup_lengths = NEW_GDL

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
