"""Interleaved A/B for two r15 micro-changes:

1. streaming char-LCP cursors capped at max_chars instead of the
   default 256 (two fewer refinement steps, no whole-string memcmp
   windows) — A side monkeypatches dedup_queries._lcp_sql to force the
   old cap=256;
2. pagerank node-grain lazy checkpoints (nodes distinct + out_deg
   evaluated once instead of ~5x/2x) — A side monkeypatches the old
   un-checkpointed pagerank back in.

Old and new alternate inside one warmed JVM so host drift cancels;
queries are streaming/checkpointed (construct-each), so each run
rebuilds the full pipeline.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from chewdata_spark.session import get_spark
from chewdata_spark.operators import graph as G
from chewdata_spark.operators import suffix as S
from chewdata_spark.queries import dedup_queries as DQ

REAL_LCP = S._lcp_sql
NEW_PR = G.pagerank


def old_lcp(unit, a="suf", b="suf2", cap=256):
    return REAL_LCP(unit, a=a, b=b, cap=256)


def old_pagerank(edges, *, src="src", dst="dst", iters=2, damping=0.85):
    edges = edges.localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("_n"))
    out_deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("_deg"))
    pr = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", F.round(F.lit(1.0) / F.col("_n"), 6).alias("pr")
    )
    for _ in range(iters):
        contrib = (
            edges.join(pr.withColumnRenamed("node", src), src)
            .join(out_deg, src)
            .select(
                F.col(dst).alias("node"),
                (F.col("pr") / F.col("_deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        pr = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "node",
                F.round(
                    (1.0 - damping) / F.col("_n")
                    + damping * F.coalesce(F.col("in_sum"), F.lit(0.0)),
                    6,
                ).alias("pr"),
            )
        )
    return pr


CASES = {
    "stream_ingest_dedup_sa": (
        lambda: setattr(DQ, "_lcp_sql", old_lcp),
        lambda: setattr(DQ, "_lcp_sql", REAL_LCP),
    ),
    "stream_cut_spans_sa_full": (
        lambda: setattr(DQ, "_lcp_sql", old_lcp),
        lambda: setattr(DQ, "_lcp_sql", REAL_LCP),
    ),
    "pagerank_order_graph": (
        lambda: setattr(G, "pagerank", old_pagerank),
        lambda: setattr(G, "pagerank", NEW_PR),
    ),
}


def main():
    sf_dir = "/root/testdata/sf0.1"
    names = sys.argv[1:] or list(CASES)
    from chewdata_spark.queries import all_queries

    queries = all_queries()
    spark = get_spark("misc-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name):
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    for name in names:
        set_old, set_new = CASES[name]
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
