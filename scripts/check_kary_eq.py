"""Equivalence check for the r15 k-ary refinement round: the OLD
binary prefix-doubling loop (pre-k-ary, with the fused peer count and
``m`` output) vs the NEW k-ary `_prefix_double`, over the SAME base
ranks, compared exceptAll BOTH ways on the full (doc_id, off, rank, m)
output — char grain at max_chars 64/128/256 and token grain at
max_tokens 32/64, sf0.001 and sf0.01."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chewdata_spark.session import get_spark
from chewdata_spark.operators import suffix as S


def old_prefix_double(work, max_units, *, h0=1):
    """The pre-k-ary loop exactly as committed (binary rounds, fused
    range-frame peer count, m emitted)."""
    if h0 >= max_units:
        return work.withColumn(
            "m", F.count(F.lit(1)).over(Window.partitionBy("rank"))
        ).localCheckpoint()
    frozen = []
    h = h0
    grp_w = Window.partitionBy("rank").orderBy("nxt")
    peer_w = grp_w.rangeBetween(0, 0)
    work = work.withColumn(
        "_m", F.count(F.lit(1)).over(Window.partitionBy("rank"))
    ).localCheckpoint()

    def _lk(df):
        return df.select(
            "doc_id", (F.col("off") - h).alias("off"), F.col("rank").alias("nxt")
        )

    while h < max_units:
        still = work.filter(F.col("_m") >= 2).drop("_m")
        done = work.filter(F.col("_m") == 1)
        frozen.append(done)
        if still.isEmpty():
            work = None
            break
        lookup = _lk(still)
        for piece in frozen:
            lookup = lookup.unionByName(_lk(piece))
        lookup = lookup.filter(F.col("off") >= 1)
        work = (
            still.join(lookup, ["doc_id", "off"], "left")
            .withColumn("nxt", F.coalesce("nxt", F.lit(0)))
            .select(
                "doc_id",
                "off",
                (F.col("rank") + F.rank().over(grp_w) - 1).alias("rank"),
                F.count(F.lit(1)).over(peer_w).alias("_m"),
            )
            .localCheckpoint()
        )
        h *= 2
    out = frozen[0]
    for piece in frozen[1:]:
        out = out.unionByName(piece)
    if work is not None:
        out = out.unionByName(work)
    return out.withColumnRenamed("_m", "m")


def main():
    spark = get_spark("kary-eq")
    spark.sparkContext.setLogLevel("ERROR")
    new_pd = S._prefix_double
    bad = 0
    for sf in ("0.001", "0.01"):
        docs = spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet")
        for mc in (64, 128, 256):
            cd = S._char_docs(docs, "doc_id", "text", mc)
            S._prefix_double = old_prefix_double
            old = S._char_ranks(cd, mc)
            S._prefix_double = new_pd
            new = S._char_ranks(cd, mc)
            a = old.exceptAll(new).count()
            b = new.exceptAll(old).count()
            n = new.count()
            print(f"sf{sf} char max={mc}: rows={n} old-new={a} new-old={b}",
                  flush=True)
            bad += a + b
        for mt in (32, 64):
            td = S._token_docs(docs, "doc_id", "text", mt)
            S._prefix_double = old_prefix_double
            old = S._token_ranks(td, mt)
            S._prefix_double = new_pd
            new = S._token_ranks(td, mt)
            a = old.exceptAll(new).count()
            b = new.exceptAll(old).count()
            n = new.count()
            print(f"sf{sf} token max={mt}: rows={n} old-new={a} new-old={b}",
                  flush=True)
            bad += a + b
    print("MISMATCH TOTAL:", bad, flush=True)
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
