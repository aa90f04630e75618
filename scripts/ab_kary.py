"""In-session interleaved A/B for the r15 k-ary refinement round —
monkeypatches the OLD (binary, fused-peer-count) `_prefix_double` back
in for the A side; old and new alternate in one warmed JVM so host
drift and JIT state cancel."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chewdata_spark.session import get_spark
from chewdata_spark.operators import suffix as S
from check_kary_eq import old_prefix_double

NEW = S._prefix_double


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or [
        "dedup_cut_spans_sa_full",
        "curate_pipeline_full_sa",
        "documents_longest_repeats",
        "dedup_cut_spans_sa_tokens",
        "curate_pipeline_decontam_sa",
    ]
    from chewdata_spark.queries import all_queries

    queries = all_queries()
    spark = get_spark("kary-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name):
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    for name in names:
        S._prefix_double = old_prefix_double
        run(name)  # warmup old
        S._prefix_double = NEW
        run(name)  # warmup new
        olds, news = [], []
        for _ in range(2):
            S._prefix_double = old_prefix_double
            spark.sparkContext.setJobDescription(f"{name} OLD")
            olds.append(run(name))
            S._prefix_double = NEW
            spark.sparkContext.setJobDescription(f"{name} NEW")
            news.append(run(name))
        spark.catalog.clearCache()
        print(
            f"{name:40s} old={min(olds):7.2f}s new={min(news):7.2f}s "
            f"({min(olds)/min(news):4.2f}x)  raw old={[round(x,1) for x in olds]} "
            f"new={[round(x,1) for x in news]}",
            flush=True,
        )
    S._prefix_double = NEW
    spark.stop()


if __name__ == "__main__":
    main()
