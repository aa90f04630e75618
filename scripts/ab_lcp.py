"""In-session interleaved A/B for the LCP-cursor rewrite: constructs
each flagship twice per round — once with the old per-char fold, once
with the new binary refinement — in ONE warmed JVM, alternating, so
host drift and JIT state cancel (bench.py's fresh-vs-aged note: fresh
sessions inflate early queries)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chewdata_spark.session import get_spark
from chewdata_spark.operators import suffix as S

NEW_LCP = S._lcp_sql


def old_lcp_sql(unit, a="suf", b="suf2", cap=256):
    if unit == "char":
        size, at = "length", "substring({col}, i, 1)"
    else:
        size, at = "size", "element_at({col}, i)"
    ea, eb = at.format(col=a), at.format(col=b)
    return f"""
        aggregate(
          sequence(1, least({size}({a}), {size}({b}))),
          named_struct('n', 0, 'go', true),
          (acc, i) -> if(acc.go and {ea} = {eb},
                         named_struct('n', acc.n + 1, 'go', true),
                         named_struct('n', acc.n, 'go', false))
        ).n
    """


def main():
    sf_dir = "/root/testdata/sf0.1"
    names = sys.argv[1:] or [
        "curate_pipeline_decontam_sa",
        "curate_pipeline_full_sa",
        "dedup_cut_spans_sa_full",
    ]
    from chewdata_spark.queries import all_queries

    queries = all_queries()
    spark = get_spark("lcp-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name):
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    for name in names:
        # warmup round (not recorded): one of each
        S._lcp_sql = old_lcp_sql
        run(name)
        S._lcp_sql = NEW_LCP
        run(name)
        olds, news = [], []
        for _ in range(2):
            S._lcp_sql = old_lcp_sql
            spark.sparkContext.setJobDescription(f"{name} OLD")
            olds.append(run(name))
            S._lcp_sql = NEW_LCP
            spark.sparkContext.setJobDescription(f"{name} NEW")
            news.append(run(name))
        spark.catalog.clearCache()
        print(
            f"{name:40s} old={min(olds):7.2f}s new={min(news):7.2f}s "
            f"({min(olds)/min(news):4.2f}x)  raw old={olds} new={news}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
