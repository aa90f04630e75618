"""Interleaved A/B for the r15-flagged regression: does the
int_alphabet="auto" SAMPLE pre-screen (an extra corpus-scale
explode+sample+distinct+collect at query construction) explain
curate_pipeline_decontam_sa_bpe 20.85 -> 33.49 s?

Three arms, alternating in ONE warmed JVM (host drift cancels):
  auto   — current code: sample pre-screen + full vocabulary probe
  full   — full probe only (the int_alphabet=True shape r14 ran)
  string — no probe at all, string-array scorer path

Each arm re-constructs the query per run (the bench's
CONSTRUCT_EACH_EXTRA contract: probes and the BPE trainer collect run
inside the timer)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chewdata_spark.session import get_spark
from chewdata_spark.operators import suffix as S

ORIG = S._int_alphabet_encode


def enc_full_only(sides, max_alphabet, *, soft=False):
    # the int_alphabet=True shape, but keeping soft's decline-not-raise
    return ORIG(sides, max_alphabet, soft=False)


def enc_string(sides, max_alphabet, *, soft=False):
    return None


ARMS = [("auto", ORIG), ("full", enc_full_only), ("string", enc_string)]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    name = sys.argv[2] if len(sys.argv) > 2 else "curate_pipeline_decontam_sa_bpe"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from chewdata_spark.queries import all_queries

    queries = all_queries()
    spark = get_spark("bpe-probe-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def run(arm, fn):
        S._int_alphabet_encode = fn
        spark.sparkContext.setJobDescription(f"{name} {arm}")
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        S._int_alphabet_encode = ORIG
        return dt

    # one warmup per arm (codegen, python workers, parquet footers)
    for arm, fn in ARMS:
        run(arm, fn)
    times = {arm: [] for arm, _ in ARMS}
    for r in range(reps):
        for arm, fn in ARMS:
            times[arm].append(run(arm, fn))
        print(
            f"rep {r}: "
            + "  ".join(f"{arm}={times[arm][-1]:6.2f}s" for arm, _ in ARMS),
            flush=True,
        )
    print(f"\n{name} @ {sf_dir} (min of {reps}):")
    for arm, _ in ARMS:
        print(f"  {arm:7s} min={min(times[arm]):6.2f}s  raw={[round(x,1) for x in times[arm]]}")
    spark.stop()


if __name__ == "__main__":
    main()
