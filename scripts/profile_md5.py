"""Stage-split + factored-variant A/B for the portable (md5) MinHash
path — guide §1 measure-first.  Times each stage with the noop sink in
one warmed JVM, alternating old/new signature implementations so host
drift cancels."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from chewdata_spark.session import get_spark
from chewdata_spark.tables import load_table
from chewdata_spark.operators import dedup as D


def t(df, label, runs=2):
    df.write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:46s} {best:7.2f}s", flush=True)
    return best


def sigs_old(docs, num_perm=32, shingle_size=3):
    ex = D._shingle_rows(docs, "doc_id", "text", shingle_size).dropDuplicates(
        ["id", "s"]
    )
    aggs = [
        F.min(F.md5(F.concat_ws("|", F.lit(str(j)), F.col("s")))).alias(f"m{j}")
        for j in range(num_perm)
    ]
    return ex.groupBy("id").agg(*aggs, F.collect_set("s").alias("shingles")).select(
        "id", "shingles",
        F.array(*[F.col(f"m{j}") for j in range(num_perm)]).alias("sig"),
    )


def sigs_new(docs, num_perm=32, shingle_size=3):
    ex = D._shingle_rows(docs, "doc_id", "text", shingle_size).dropDuplicates(
        ["id", "s"]
    )
    hashes = ex.select("s").distinct().select(
        "s",
        *[
            F.md5(F.concat_ws("|", F.lit(str(j)), F.col("s"))).alias(f"h{j}")
            for j in range(num_perm)
        ],
    )
    return (
        ex.join(hashes, "s")
        .groupBy("id")
        .agg(
            *[F.min(f"h{j}").alias(f"m{j}") for j in range(num_perm)],
            F.collect_set("s").alias("shingles"),
        )
        .select(
            "id", "shingles",
            F.array(*[F.col(f"m{j}") for j in range(num_perm)]).alias("sig"),
        )
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("md5-profile")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    sc = spark.sparkContext
    sc.setJobDescription("shingle rows")
    sh = D._shingle_rows(docs, "doc_id", "text", 3)
    t(sh, "stage: _shingle_rows")
    sc.setJobDescription("shingle rows distinct")
    ex = sh.dropDuplicates(["id", "s"])
    t(ex, "stage: + dropDuplicates")
    sc.setJobDescription("xxhash sigs (fast twin)")
    t(
        D.minhash_signatures(docs, "doc_id", "text", num_perm=32, shingle_size=3),
        "stage: xxhash64 sigs (reference)",
    )

    # interleaved A/B on the signature stage, then the full query shape
    for rnd in range(2):
        sc.setJobDescription(f"md5 sigs OLD r{rnd}")
        t(sigs_old(docs), f"A/B r{rnd}: md5 sigs OLD")
        sc.setJobDescription(f"md5 sigs NEW r{rnd}")
        t(sigs_new(docs), f"A/B r{rnd}: md5 sigs NEW")

    # full candidate-pair query both ways
    for rnd in range(2):
        sc.setJobDescription(f"pairs OLD r{rnd}")
        t(
            D.minhash_candidate_pairs(
                sigs_old(docs), num_perm=32, bands=16, jaccard_threshold=0.5
            ),
            f"A/B r{rnd}: pairs from OLD sigs",
        )
        sc.setJobDescription(f"pairs NEW r{rnd}")
        t(
            D.minhash_candidate_pairs(
                sigs_new(docs), num_perm=32, bands=16, jaccard_threshold=0.5
            ),
            f"A/B r{rnd}: pairs from NEW sigs",
        )

    # row-by-row equality of the two signature paths
    a = sigs_old(docs).select("id", "sig")
    b = sigs_new(docs).select("id", "sig")
    diff = a.join(b, "id").filter(F.col("a.sig") != F.col("b.sig")) if False else (
        a.alias("a").join(b.alias("b"), "id")
        .filter(F.expr("a.sig <> b.sig"))
    )
    print("sig mismatches:", diff.count(), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
