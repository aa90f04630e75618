"""r16 verdict item 4: interleaved sweep of the char base-rank width
h0 in {16, 32} x _KARY_MAX in {3, 7} on the SA flagships.  A 16-char
base halves the gram bytes shipped through the two position-sized
base exchanges (distinct-gram groupBy + rank join-back) but leaves a
larger active tail for the k-ary loop (r15 profile: 1.39M positions
still tied at h=16 vs 317k at h=32 at sf0.1).  All arms are
bit-identical by the h0-fixpoint argument (suffix.py::_char_ranks).
Arms alternate in ONE warmed JVM."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chewdata_spark.session import get_spark
from chewdata_spark.operators import suffix as S

ARMS = [(32, 7), (16, 7), (32, 3), (16, 3)]


def main():
    sf_dir = "/root/testdata/sf0.1"
    names = sys.argv[1:] or [
        "dedup_cut_spans_sa_full",
        "curate_pipeline_full_sa",
        "documents_longest_repeats",
    ]
    from chewdata_spark.queries import all_queries

    queries = all_queries()
    spark = get_spark("h0-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name, h0, k):
        S._H0_CHAR, S._KARY_MAX = h0, k
        spark.sparkContext.setJobDescription(f"{name} h0={h0} K={k}")
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    for name in names:
        for h0, k in ARMS:
            run(name, h0, k)  # one warmup per arm
        times = {a: [] for a in ARMS}
        for _ in range(2):
            for a in ARMS:
                times[a].append(run(name, *a))
        spark.catalog.clearCache()
        print(f"{name}:")
        for a in ARMS:
            print(
                f"  h0={a[0]:2d} K={a[1]}  min={min(times[a]):6.2f}s"
                f"  raw={[round(x,1) for x in times[a]]}",
                flush=True,
            )
    S._H0_CHAR, S._KARY_MAX = 32, 7
    spark.stop()


if __name__ == "__main__":
    main()
