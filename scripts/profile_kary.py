"""Stage-isolated interleaved A/B of the rank BUILD alone (old binary
loop vs new k-ary) + per-round active counts, at sf0.1 for the three
declared shapes: char tile=128 (the tiled flagships' shape), char
head=256, token max=64."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chewdata_spark.session import get_spark
from chewdata_spark.operators import suffix as S
from check_kary_eq import old_prefix_double

NEW = S._prefix_double


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("kary-profile")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def build(shape, impl):
        S._prefix_double = impl
        # the loop materializes via localCheckpoint at CONSTRUCTION
        # time, so the timer must wrap construction + the final write
        t0 = time.perf_counter()
        if shape == "char128":
            r = S._char_ranks(S._char_docs(docs, "doc_id", "text", 128), 128)
        elif shape == "char256":
            r = S._char_ranks(S._char_docs(docs, "doc_id", "text", 256), 256)
        else:
            r = S._token_ranks(S._token_docs(docs, "doc_id", "text", 64), 64)
        r.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # per-round active counts (new loop), instrumented via a wrapper
    for shape in ("char128", "char256", "token64"):
        for impl, tag in ((old_prefix_double, "old"), (NEW, "new")):
            build(shape, impl)  # warmup
        olds, news = [], []
        for _ in range(3):
            spark.sparkContext.setJobDescription(f"{shape} OLD")
            olds.append(build(shape, old_prefix_double))
            spark.sparkContext.setJobDescription(f"{shape} NEW")
            news.append(build(shape, NEW))
        print(
            f"{shape:10s} old={min(olds):6.2f}s new={min(news):6.2f}s "
            f"({min(olds)/min(news):4.2f}x) raw old={[round(x,1) for x in olds]} "
            f"new={[round(x,1) for x in news]}",
            flush=True,
        )
    S._prefix_double = NEW
    spark.stop()


if __name__ == "__main__":
    main()
