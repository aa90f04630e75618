"""Targeted per-query re-timer: bench.py's exact measurement protocol
(noop sink, warmup + min of 2 steady-state runs, construct-each for
streaming/checkpoint-backed/probe-at-construction queries) over a
named subset — the before/after instrument for optimization work.

Usage: python scripts/retime_queries.py q1 q2 ... [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chewdata_spark.queries import all_queries
from chewdata_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]

    from bench import _construct_each  # reuse bench's protocol

    spark = get_spark("chewdata_spark-retime")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    for name in args:
        spark.sparkContext.setJobDescription(name)
        df = None if _construct_each(name) else queries[name](spark, sf_dir)
        if df is None or _construct_each(name, df):
            start = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = time.perf_counter() - start
            for _ in range(2):
                start = time.perf_counter()
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - start)
        else:
            df.write.format("noop").mode("overwrite").save()
            best = float("inf")
            for _ in range(2):
                start = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - start)
        print(f"{name:45s} {best:8.3f}s", flush=True)
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)

    spark.stop()


if __name__ == "__main__":
    main()
