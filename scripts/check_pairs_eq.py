"""Equivalence check for the r15 `_adjacent_pairs` rewrite: the old
self-join `_group_dup_lengths` (and the old top-n adjacency joins) vs
the new single-groupBy pairing, exceptAll BOTH ways, across grains,
windows and SFs.  0 rows each way = bit-identical.

Usage: python scripts/check_pairs_eq.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

from pyspark.sql import DataFrame, functions as F

from chewdata_spark.session import get_spark
from chewdata_spark.tables import load_table
from chewdata_spark.operators.suffix import (
    _char_docs,
    _char_ranks,
    _group_dup_lengths,
    _lcp_sql,
    _rep_suffixes,
    _tiled_docs,
    _token_docs,
    _token_ranks,
    longest_repeated_substrings,
)
from chewdata_spark.operators import suffix as S


def old_group_dup_lengths(suf: DataFrame, unit: str, cap: int = 256) -> DataFrame:
    """The pre-rewrite shape: adjacency via rank+m self-join, own
    lengths unioned, groupBy-max (verbatim from commit 96caf9a)."""
    size = F.length if unit == "char" else F.size
    nxt = suf.select(F.col("rank").alias("_rk2"), F.col("suf").alias("suf2"))
    lcp = F.expr(_lcp_sql(unit, cap=cap))
    adj = (
        suf.join(nxt, (F.col("rank") + F.col("m")) == F.col("_rk2"))
        .select("rank", "_rk2", F.coalesce(lcp, F.lit(0)).alias("l"))
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("rank").alias("rank"), F.col("l").alias("l")),
                    F.struct(F.col("_rk2").alias("rank"), F.col("l").alias("l")),
                )
            ).alias("x")
        )
        .select(F.col("x.rank").alias("rank"), F.col("x.l").alias("l"))
    )
    own = suf.select(
        "rank",
        F.when(F.col("m") >= 2, size("suf")).otherwise(F.lit(0)).alias("l"),
    )
    return (
        own.unionByName(adj)
        .groupBy("rank")
        .agg(F.max("l").alias("dup_len"))
    )


def check(label: str, old: DataFrame, new: DataFrame) -> bool:
    a = old.exceptAll(new).count()
    b = new.exceptAll(old).count()
    ok = a == 0 and b == 0
    print(f"{label:55s} old\\new={a} new\\old={b} -> {'OK' if ok else 'MISMATCH'}",
          flush=True)
    return ok


def main() -> None:
    spark = get_spark("check-pairs-eq")
    spark.sparkContext.setLogLevel("ERROR")
    all_ok = True

    for sf in ("0.001", "0.01"):
        docs = load_table(spark, f"/root/testdata/sf{sf}", "documents")

        # char grain, head windows
        for mc in (64, 128):
            cd = _char_docs(docs, "doc_id", "text", mc)
            ranks = _char_ranks(cd, mc).localCheckpoint()
            suf = _rep_suffixes(ranks, cd, "char", mc)
            all_ok &= check(
                f"sf{sf} char head mc={mc}",
                old_group_dup_lengths(suf, "char", cap=mc),
                _group_dup_lengths(suf, "char", cap=mc),
            )

        # char grain, tiled full-doc shape (the flagship relation)
        tile, stride = 128, 99
        wd = _tiled_docs(docs, "doc_id", "text", tile, stride)
        ranks = _char_ranks(wd, tile).localCheckpoint()
        suf = _rep_suffixes(ranks, wd, "char", tile)
        all_ok &= check(
            f"sf{sf} char tiled tile={tile}",
            old_group_dup_lengths(suf, "char", cap=tile),
            _group_dup_lengths(suf, "char", cap=tile),
        )

        # token grain
        for mt in (32, 64):
            td = _token_docs(docs, "doc_id", "text", mt)
            ranks = _token_ranks(td, mt).localCheckpoint()
            suf = _rep_suffixes(ranks, td, "token", mt)
            all_ok &= check(
                f"sf{sf} token mt={mt}",
                old_group_dup_lengths(suf, "token", cap=mt),
                _group_dup_lengths(suf, "token", cap=mt),
            )

    # top-n twins: old adjacency (reconstructed) vs new shared-pairs path,
    # compared on the FINAL query output (deterministic order + limit)
    for sf in ("0.001", "0.01"):
        docs = load_table(spark, f"/root/testdata/sf{sf}", "documents")
        new_rows = [
            tuple(r)
            for r in longest_repeated_substrings(
                docs, "doc_id", "text", max_chars=128, min_len=10, top_n=20
            ).collect()
        ]
        cd = _char_docs(docs, "doc_id", "text", 128)
        ranks = _char_ranks(cd, 128)
        suf = _rep_suffixes(ranks, cd, "char", 128)
        nxt = suf.select(F.col("rank").alias("_rk2"), F.col("suf").alias("suf2"))
        adjacent = (
            suf.join(nxt, (F.col("rank") + F.col("m")) == F.col("_rk2"))
            .select(F.expr(_lcp_sql("char", cap=128)).alias("lcp"), "suf")
            .select(F.expr("substring(suf, 1, lcp)").alias("substring"),
                    F.col("lcp").alias("length"))
        )
        dup_groups = suf.filter(F.col("m") >= 2).select(
            F.col("suf").alias("substring"), F.length("suf").alias("length")
        )
        old_rows = [
            tuple(r)
            for r in (
                adjacent.unionByName(dup_groups)
                .filter(F.col("length") >= 10)
                .dropDuplicates(["substring"])
                .orderBy(F.col("length").desc(), F.col("substring").asc())
                .limit(20)
            ).collect()
        ]
        ok = old_rows == new_rows
        print(f"{'sf' + sf + ' longest_repeated_substrings top-20':55s} "
              f"-> {'OK' if ok else 'MISMATCH'}", flush=True)
        all_ok &= ok

    print("ALL OK" if all_ok else "MISMATCHES FOUND")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
