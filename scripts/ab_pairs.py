"""Query-level interleaved A/B for the `_adjacent_pairs` rewrite:
full declared queries re-constructed under the old self-join
`_group_dup_lengths` (scripts/check_pairs_eq.py) vs the new pairing,
alternating in one warmed JVM (host drift cancels).

Usage: python scripts/ab_pairs.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chewdata_spark.session import get_spark
from chewdata_spark.operators import suffix as S
from chewdata_spark.queries import all_queries
from scripts.check_pairs_eq import old_group_dup_lengths

NEW_GDL = S._group_dup_lengths


def main():
    names = sys.argv[1:] or ["dedup_cut_spans_sa_full", "dedup_cut_spans_sa_tokens"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pairs-ab")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    def run(name):
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in names:
        S._group_dup_lengths = old_group_dup_lengths
        run(name)  # warmup old
        S._group_dup_lengths = NEW_GDL
        run(name)  # warmup new
        olds, news = [], []
        for _ in range(2):
            S._group_dup_lengths = old_group_dup_lengths
            olds.append(run(name))
            S._group_dup_lengths = NEW_GDL
            news.append(run(name))
        print(
            f"{name:35s} old={min(olds):6.2f}s new={min(news):6.2f}s "
            f"({min(olds)/min(news):4.2f}x)  raw old={[round(x,1) for x in olds]} "
            f"new={[round(x,1) for x in news]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
